package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CharNgrams (native one-byte-walk gram slicer) vs the composable
  * `transform(sequence(1, length - n + 1), i -> substring(text, i,
  * n))` form — element-wise identical on every length >= n input,
  * since `text_char_ngrams`'s oracle hash rides the gram stream and
  * the DuckDB `list_transform(range(...))` mirror is derived from the
  * HOF semantics. (Below length n the twin is undefined by design:
  * `sequence(1, 0)` counts down — callers filter first; the native
  * form returns an empty array, asserted separately.) */
class CharNgramsSpec extends SparkSpec {

  test("native == HOF trigrams over the full sf0.01 corpus") {
    GraftFunctions.ensureRegistered(spark)
    val mism = graft.Tables.documents(spark, SparkSpec.sf001)
      .filter(length(col("text")) >= 3)
      .select(
        GraftFunctions.charNgrams(col("text"), 3).as("native"),
        GraftFunctions.charNgramsHof(col("text"), 3).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mism == 0L, s"$mism corpus gram arrays diverge")
  }

  test("native == HOF on edge strings and other n, incl. non-ASCII") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark; import s.implicits._
    val cases = Seq(
      "abc",                    // exactly n: one gram
      "abcd",
      "héllo wörld",            // multi-byte code points
      "数据处理引擎",            // 3-byte UTF-8 sequences
      "mixed 数据 text",
      "emoji 😀 pair",          // supplementary plane (4-byte)
      "aaaa"                    // repeated grams preserved in order
    )
    for (n <- Seq(2, 3, 5)) {
      val rows = cases.toDF("text")
        .filter(length(col("text")) >= n)
        .select(col("text"),
          GraftFunctions.charNgrams(col("text"), n).as("native"),
          GraftFunctions.charNgramsHof(col("text"), n).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n grams diverge on '${r.getString(0)}': " +
            s"native=${r.getSeq[String](1)} hof=${r.getSeq[String](2)}")
      }
    }
  }

  test("native yields an empty array below length n; HOF is undefined" +
    " there by design") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark; import s.implicits._
    val rows = Seq("", "a", "ab", "数据").toDF("text")
      .select(GraftFunctions.charNgrams(col("text"), 3).as("native"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0).isEmpty))
  }

  test("native participates in whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    val p = graft.Tables.documents(spark, SparkSpec.sf0001)
      .select(GraftFunctions.charNgrams(col("text"), 3).as("g"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("* Project") && p.contains("codegen id"),
      s"char_ngrams projection fell out of whole-stage codegen:\n$p")
  }
}
