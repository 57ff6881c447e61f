package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FingerprintHash (native codegen string fold) vs the composable
  * `aggregate(split(text,''), …)` form — they must be value-identical
  * on every input, since `text_fingerprint`'s oracle hash and
  * `dedup_exact_fingerprint`'s grouping both ride the fold, and the
  * DuckDB `list_reduce` mirror is derived from the HOF semantics. */
class FingerprintHashSpec extends SparkSpec {

  test("native == HOF over the full sf0.01 corpus") {
    GraftFunctions.ensureRegistered(spark)
    val mism = graft.Tables.documents(spark, SparkSpec.sf001)
      .select(
        GraftFunctions.rollingFingerprint(col("text")).as("native"),
        GraftFunctions.rollingFingerprintHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mism == 0L, s"$mism corpus fingerprints diverge")
  }

  test("native == HOF on edge strings: empty, non-ASCII, surrogates") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark; import s.implicits._
    val cases = Seq(
      "",                       // split('') -> [''], ascii('') = 0
      "a",
      "héllo wörld",            // Latin-1 supplement code points
      "数据处理引擎",            // BMP CJK
      "mixed 数据 text",
      "emoji 😀 pair" // supplementary plane: one code point
    )
    val rows = cases.toDF("text")
      .select(col("text"),
        GraftFunctions.rollingFingerprint(col("text")).as("native"),
        GraftFunctions.rollingFingerprintHof(col("text")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"fold diverges on '${r.getString(0)}': " +
          s"native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
    // and the value is the documented fold, driver-side
    def fold(t: String): Long =
      if (t.isEmpty) (7L * 31L) % 1000000007L
      else {
        var acc = 7L
        var i = 0
        while (i < t.length) {
          val cp = t.codePointAt(i)
          acc = (acc * 31L + cp) % 1000000007L
          i += Character.charCount(cp)
        }
        acc
      }
    rows.foreach(r => assert(r.getLong(1) == fold(r.getString(0))))
  }

  test("native participates in whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    val p = graft.Tables.documents(spark, SparkSpec.sf0001)
      .select(GraftFunctions.rollingFingerprint(col("text")).as("fp"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted mode marks codegen'd nodes with `*` + a codegen id
    // (there is no literal WholeStageCodegen line) — the Project
    // carrying fingerprint_hash must show both
    assert(p.contains("* Project") && p.contains("codegen id"),
      s"fingerprint projection fell out of whole-stage codegen:\n$p")
  }
}
