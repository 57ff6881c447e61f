package graft.sources

import graft.{RowNorm, SparkEntry, SparkSpec}
import graft.operators.RegistrySpec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Vectorized vs row-based parquet decode parity (round 14).
  *
  * Spark ships two complete parquet decode implementations: the
  * default columnar `VectorizedParquetRecordReader` and the
  * parquet-mr row-based fallback (`spark.sql.parquet.
  * enableVectorizedReader=false`). They are different code down to
  * the value level — dictionary decode, decimal binary unpacking,
  * timestamp INT96/INT64 conversion, nested array assembly — and on
  * a real cluster the fallback is not hypothetical: schemas evolve
  * past the vectorized reader's support matrix and the planner
  * silently switches paths per file. Any query whose result depends
  * on WHICH decoder ran is corrupt at 100 TB in a way no small-SF
  * oracle run on one fixed path would ever show.
  *
  * So: EVERY declared query must return identical results (the
  * oracle's 9-significant-digit bar, same normalization) under both
  * decoders. Caches are cleared between passes so persisted
  * intermediates rebuild through the decoder under test rather than
  * short-circuiting it. Queries empty at sf0.001
  * (RegistrySpec.mayBeEmpty) are vacuous there and re-proven with
  * rows at sf0.01 / sf0.1 — the same structure as SpillSpec and
  * ShapeInvarianceSpec.
  *
  * Controls: the conf must actually select the decoder — the scan
  * node's `supportsColumnar` is asserted true under the default and
  * false under the fallback (otherwise every row above is vacuous),
  * on a scan of each distinct physical column shape in the fixture
  * (flat numerics/strings/timestamps, nested array<float>, long
  * text).
  */
class ScanParitySpec extends SparkSpec {

  private def norm = RowNorm.norm _

  private def withRowBasedScan[T](body: => T): T = {
    val conf = spark.conf
    val key = "spark.sql.parquet.enableVectorizedReader"
    val prev = conf.getOption(key)
    conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  private def run(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().map(norm).toSeq

  private def compare(name: String, base: Seq[String],
      rowBased: Seq[String]): Unit = {
    assert(base.length == rowBased.length,
      s"$name: ${base.length} rows vectorized vs ${rowBased.length} row-based")
    val diffs = base.zip(rowBased).zipWithIndex.collect {
      case ((x, y), i) if x != y => s"row $i:\n  vectorized=$x\n  row-based=$y"
    }
    assert(diffs.isEmpty,
      s"$name differs between parquet decoders (first 3):\n" +
        diffs.take(3).mkString("\n"))
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name: identical result under the row-based parquet decoder") {
      graft.Cache.clear(spark)
      val base = run(name, SparkSpec.sf0001)
      graft.Cache.clear(spark)
      val rowBased = withRowBasedScan(run(name, SparkSpec.sf0001))
      assert(base.nonEmpty || RegistrySpec.mayBeEmpty(name),
        s"$name empty at sf0.001 — test is vacuous")
      compare(name, base, rowBased)
    }
  }

  // Empty-at-toy families re-proven with rows (geo pair family +
  // banded join at sf0.01; dedup family, planted duplicates, at
  // sf0.1 — one pass per regime so shared caches rebuild through
  // the row-based decoder too).
  Seq("geo_co_presence", "geo_meeting_streaks", "geo_triangles",
    "join_range_banded").foreach { name =>
    test(s"$name: decoder-invariant at sf0.01 (rows > 0)") {
      graft.Cache.clear(spark)
      val base = run(name, SparkSpec.sf001)
      graft.Cache.clear(spark)
      val rowBased = withRowBasedScan(run(name, SparkSpec.sf001))
      assert(base.nonEmpty, s"$name empty at sf0.01 — test is vacuous")
      compare(name, base, rowBased)
    }
  }

  test("dedup family: decoder-invariant at sf0.1 (planted dups)") {
    val family = SparkEntry.queries.keys.filter(_.startsWith("dedup_"))
      .toSeq.sorted
    def pass(rowBased: Boolean): Map[String, Seq[String]] = {
      graft.Cache.clear(spark)
      def go() = family.map(n => n -> run(n, SparkSpec.sf01)).toMap
      if (rowBased) withRowBasedScan(go()) else go()
    }
    val base = pass(rowBased = false)
    val forced = pass(rowBased = true)
    val empty = family.filter(base(_).isEmpty)
    assert(empty.isEmpty, s"empty at sf0.1 (vacuous): $empty")
    family.foreach(n => compare(n, base(n), forced(n)))
  }

  // Controls: prove the conf selects the decoder for every distinct
  // physical column shape the fixture stores. `supportsColumnar` on
  // the FileSourceScanExec IS the dispatch bit — when false, the
  // scan emits rows through parquet-mr.
  private val shapes = Seq(
    // Every physical type the fixture stores: int32/int64/double/
    // string/timestamp[us] flat columns, plus the one nested shape
    // (list<float>) and the long-text strings the dedup/text ops
    // decode. (Decimal/binary exist only as query-time casts, so
    // there is no stored shape to dispatch on.)
    "flat numerics + strings + timestamp" -> s"${SparkSpec.sf0001}/lineitem.parquet",
    "timestamp-carrying events" -> s"${SparkSpec.sf0001}/events.parquet",
    "array<float> embeddings" -> s"${SparkSpec.sf0001}/embeddings.parquet",
    "long-text documents" -> s"${SparkSpec.sf0001}/documents.parquet")

  private def scanIsColumnar(path: String): Boolean = {
    val scans = spark.read.parquet(path).queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no FileSourceScanExec planned for $path")
    scans.forall(_.supportsColumnar)
  }

  shapes.foreach { case (label, path) =>
    test(s"control: decoder dispatch is real for $label") {
      assert(scanIsColumnar(path),
        s"$label does not plan a columnar scan under the DEFAULT conf — " +
          "the vectorized side of every parity row is vacuous")
      assert(withRowBasedScan(!scanIsColumnar(path)),
        s"$label still plans a columnar scan with the vectorized reader " +
          "disabled — the row-based side of every parity row is vacuous")
    }
  }
}
