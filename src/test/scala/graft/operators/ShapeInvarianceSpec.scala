package graft.operators

import graft.{RowNorm, SparkEntry, SparkSpec}

/** Cluster-shape invariance over the whole query surface (round 14).
  *
  * The scale contract claims no query's RESULT depends on how the
  * cluster happens to be shaped — partition counts, input-split
  * sizes, task interleaving. RegistrySpec proves determinism under
  * ONE shape; this spec re-executes every declared query under two
  * deliberately different execution shapes and asserts the outputs
  * agree at the oracle's own comparison bar (9 significant digits,
  * check.py `norm`):
  *
  *  - shape A: the suite default — `shuffle.partitions=4`, 128 MB
  *    scan splits (one task per toy file).
  *  - shape B: a "wide cluster" — `shuffle.partitions=13` (odd and
  *    coprime with every key cardinality in the fixture, so every
  *    hash bucket boundary moves) and 64 KB scan splits (multi-task
  *    scans, the many-executor read pattern; on the single-row-group
  *    fixture files the extra splits are empty, so the row-moving
  *    axis is the shuffle bucketing — the negative controls below
  *    pin exactly what each knob does and does not vary here).
  *
  * What this catches that per-shape determinism cannot: partition-
  * index-dependent logic (`spark_partition_id`, zipWithIndex-style
  * ids), first()/head-of-partition nondeterminism, accumulation-
  * order-sensitive float reductions past the 9-digit bar, and any
  * window/ORDER BY whose key set under-determines the output only
  * when a shuffle actually splits it. All of these are exactly the
  * bugs that surface on a real 1000-executor cluster and never on a
  * single toy partition.
  *
  * Caches are cleared between shapes: persisted intermediates (LSH
  * signatures, IVF cells, dedup pair graphs) must be REBUILT under
  * shape B, so index construction itself is inside the invariance
  * claim, not frozen out of it by memoization.
  */
class ShapeInvarianceSpec extends SparkSpec {

  /** check.py's `norm` (9 significant digits) — shared definition,
    * see [[graft.RowNorm]]. */
  private def norm = RowNorm.norm _

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, SparkSpec.sf0001)
      .collect().map(norm).toSeq

  private def withShape[T](partitions: String, splitBytes: String)(
      body: => T): T = {
    val conf = spark.conf
    // initialPartitionNum must track the shape too: EngineConf.tuned
    // pins it at 256 (adaptive shuffle width, r16), which DECOUPLES
    // the executed exchanges' bucket count from shuffle.partitions —
    // without overriding it here both shapes would hash into 256
    // buckets and the whole shuffle axis of this suite would be
    // vacuous (the negative control below caught exactly that when
    // the conf landed).
    val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val prevP = conf.get("spark.sql.shuffle.partitions")
    val prevS = conf.get("spark.sql.files.maxPartitionBytes")
    val prevI = conf.get(initKey)
    conf.set("spark.sql.shuffle.partitions", partitions)
    conf.set("spark.sql.files.maxPartitionBytes", splitBytes)
    conf.set(initKey, partitions)
    try body
    finally {
      conf.set("spark.sql.shuffle.partitions", prevP)
      conf.set("spark.sql.files.maxPartitionBytes", prevS)
      conf.set(initKey, prevI)
    }
  }

  // Negative controls: the harness must DETECT shape dependence, or
  // the 157 green tests above prove nothing. Two knobs, two controls.
  //
  // (1) Scan splits. The fixture's sf0.001 parquet files hold ONE row
  // group each, and a split that doesn't contain a row-group start
  // reads zero rows — so 64 KB splits change split BOOKKEEPING on the
  // fixture but cannot move fixture rows between tasks (measured:
  // lineitem reads as 2 splits, all rows in split 0). Rows DO
  // redistribute as soon as the file has several row groups — the
  // 100 TB reality — so the control writes a scratch parquet with
  // 64 KB row groups and requires spark_partition_id to expose a
  // multi-task scan under shape B and a single-task scan under A.
  test("negative control: scan splits redistribute multi-row-group rows") {
    import org.apache.spark.sql.functions.spark_partition_id
    val scratch = "/tmp/graft_shape_control"
    spark.range(0, 60000)
      .selectExpr("id", "cast(id as double) as v").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024).parquet(scratch)
    def pids(): Seq[String] =
      spark.read.parquet(scratch).select(spark_partition_id().as("pid"))
        .distinct().orderBy("pid").collect().map(norm).toSeq
    val a = withShape("4", (128L << 20).toString)(pids())
    val b = withShape("13", (64L << 10).toString)(pids())
    assert(a.length == 1 && b.length > 1,
      s"split conf is NOT reaching execution (shape A read ${a.length} " +
        s"populated scan task(s), shape B ${b.length}) — the invariance " +
        "suite's scan axis is vacuous")
  }

  // (2) Shuffle buckets. Under AQE the post-coalesce partition COUNT
  // collapses to ~1 at toy scale under both shapes, but the map-side
  // hash bucket count is the conf value, and bucket membership
  // (pmod(hash(k), n)) plus the coalescer's in-order bucket
  // concatenation decide row ORDER inside every reduce partition —
  // exactly the order float accumulation and first()/head pitfalls
  // feel on a real cluster. The control pins that the executed plan's
  // exchanges really carry 4 vs 13.
  test("negative control: shuffle bucket count reaches the executed plan") {
    def buckets(): String = {
      val q = graft.Tables.table(spark, SparkSpec.sf0001, "orders")
        .groupBy("o_orderstatus")
        .agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      q.collect()
      q.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("hashpartitioning")).mkString("|")
    }
    val a = withShape("4", (128L << 20).toString)(buckets())
    val b = withShape("13", (64L << 10).toString)(buckets())
    assert(a.contains(", 4)") && b.contains(", 13)"),
      s"shuffle.partitions is NOT reaching the executed plan:\n  A=$a\n  B=$b")
  }

  // The sf0.001 sweep above is VACUOUS for queries whose output is
  // empty at that scale (RegistrySpec.mayBeEmpty): an empty result is
  // trivially shape-invariant. Re-prove those on the smallest SF
  // where they return rows — the geo pair family and the banded join
  // at sf0.01 (79 co-presence pairs / 3 banded suppliers), and the
  // WHOLE dedup family at sf0.1, the only SF with planted duplicates
  // (FIXTURES.md: 8 exact pairs, 248 near-dup edits). Dedup matters
  // most here: LSH banding, pair-graph build and component labeling
  // are exactly where bucket-boundary and accumulation-order bugs
  // would hide. One pass per shape for the family (not per query)
  // so the shared pair-graph/signature caches build twice total.
  private val sf001Families =
    Seq("geo_co_presence", "geo_meeting_streaks", "geo_triangles",
      "join_range_banded")
  sf001Families.foreach { name =>
    test(s"$name is invariant to cluster shape (sf0.01, rows > 0)") {
      graft.Cache.clear(spark)
      def go() = SparkEntry.queries(name)(spark, SparkSpec.sf001)
        .collect().map(norm).toSeq
      val a = withShape("4", (128L << 20).toString)(go())
      graft.Cache.clear(spark)
      val b = withShape("13", (64L << 10).toString)(go())
      assert(a.nonEmpty, s"$name empty at sf0.01 — test is vacuous")
      assert(a == b, s"$name differs across cluster shapes at sf0.01")
    }
  }

  test("dedup family is invariant to cluster shape (sf0.1, planted dups)") {
    val family = SparkEntry.queries.keys.filter(_.startsWith("dedup_"))
      .toSeq.sorted
    def pass(): Map[String, Seq[String]] = {
      graft.Cache.clear(spark)
      family.map(n => n -> SparkEntry.queries(n)(spark, SparkSpec.sf01)
        .collect().map(norm).toSeq).toMap
    }
    val a = withShape("4", (128L << 20).toString)(pass())
    val b = withShape("13", (64L << 10).toString)(pass())
    val empty = family.filter(a(_).isEmpty)
    assert(empty.isEmpty,
      s"empty at sf0.1 (vacuous for shape invariance): $empty")
    val diffs = family.filter(n => a(n) != b(n))
    assert(diffs.isEmpty,
      s"dedup queries differ across cluster shapes at sf0.1: $diffs")
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name is invariant to cluster shape") {
      graft.Cache.clear(spark)
      val a = withShape("4", (128L << 20).toString)(run(name))
      graft.Cache.clear(spark)
      val b = withShape("13", (64L << 10).toString)(run(name))
      val diffs = a.zip(b).zipWithIndex.collect {
        case ((x, y), i) if x != y => s"row $i:\n  A=$x\n  B=$y"
      }
      assert(a.length == b.length,
        s"$name: ${a.length} rows under shape A vs ${b.length} under B")
      assert(diffs.isEmpty,
        s"$name differs across cluster shapes (first 3):\n" +
          diffs.take(3).mkString("\n"))
    }
  }
}
