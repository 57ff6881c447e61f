package graft.operators

import java.util.concurrent.atomic.AtomicLong

import graft.{RowNorm, SparkEntry, SparkSpec}
import org.apache.spark.GraftTestBus
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Spill-path invariance (round 14).
  *
  * At 100 TB every buffered operator WILL spill: window frames,
  * sort-merge-join match buffers, cartesian blocks and hash
  * aggregates all overflow executor memory somewhere on a 1000-
  * executor run. The toy fixtures never get near those limits, so
  * the suite's green says nothing about the spill code paths —
  * unless we force them. Spark exposes exactly the knobs its own
  * test suite uses for this (public `SQLConf` thresholds, runtime-
  * settable):
  *
  *  - `spark.sql.windowExec.buffer.{in.memory,spill}.threshold`
  *  - `spark.sql.sortMergeJoinExec.buffer.{in.memory,spill}.threshold`
  *  - `spark.sql.cartesianProductExec.buffer.{in.memory,spill}.threshold`
  *  - `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  *  - `spark.sql.TungstenAggregate.testFallbackStartsAt` (hash agg →
  *    sort-based fallback after N rows; the conf Spark's own
  *    AggregationQuerySuite drives the fallback with)
  *
  * With in-memory thresholds at 1 and spill thresholds of a few
  * rows, every buffered row set takes the UnsafeExternalSorter
  * disk path, and hash aggregation completes sort-based — the same
  * operator modes a memory-starved executor would use. The claim
  * under test is twofold:
  *
  *  1. RESULTS are bit-identical (at the oracle's 9-significant-
  *     digit bar) to the un-spilled run, for EVERY declared query
  *     (the empty-at-toy families re-proven with rows at sf0.01 /
  *     sf0.1). Sort-based aggregation and spill-merge iteration
  *     change accumulation ORDER, so this is a real float-stability
  *     claim, not a tautology.
  *  2. The spills actually HAPPEN (task-metrics
  *     `memoryBytesSpilled + diskBytesSpilled > 0` while forced,
  *     and == 0 for the same query un-forced) — otherwise the suite
  *     is green because the knobs silently stopped reaching the
  *     operators, proving nothing. ShapeInvarianceSpec's negative-
  *     control discipline, applied to the spill axis.
  *
  * `spark.sql.autoBroadcastJoinThreshold = -1` rides along in the
  * forced shape so equi-joins actually take the SMJ buffer path
  * (the toy dims broadcast otherwise and buffer nothing); a plan
  * assertion pins that the forced join really executed as
  * SortMergeJoin. External-sort spills (sort_multikey et al) cannot
  * be forced from a runtime conf — `spark.shuffle.spill.
  * numElementsForceSpillThreshold` is a static SparkConf baked in at
  * session start — so the sort path is exercised implicitly via the
  * sort-based aggregate fallback here and sized by the partition
  * arithmetic in SURVEY §4 instead.
  */
class SpillSpec extends SparkSpec {

  private def norm = RowNorm.norm _

  /** Task-metrics spill meter. Suites run sequentially in the forked
    * test JVM (`Test/fork := true`, no `testForkedParallel`), so
    * between a bus drain before and after a measured body, every
    * task-end this sees belongs to that body. */
  private object Meter extends SparkListener {
    val bytes = new AtomicLong(0)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) bytes.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
    }
  }
  spark.sparkContext.addSparkListener(Meter)

  /** Run `body`, returning (result, spilled bytes attributed to it). */
  private def metered[T](body: => T): (T, Long) = {
    GraftTestBus.waitUntilEmpty(spark.sparkContext)
    val before = Meter.bytes.get
    val r = body
    GraftTestBus.waitUntilEmpty(spark.sparkContext)
    (r, Meter.bytes.get - before)
  }

  private val forcedConfs = Seq(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "1",
    "spark.sql.windowExec.buffer.spill.threshold" -> "128",
    // SMJ/cartesian: in-memory 1 forces the UnsafeExternalSorter-
    // backed buffer path for every buffered group everywhere; the
    // DISK spill thresholds stay high suite-wide because the codegen
    // join re-opens EVERY spill file's reader (1 MB buffer each) per
    // probing row — on the declared O(n²) similarity baselines,
    // which broadcast-disable turns into SMJ/cartesian with
    // hundreds-of-rows buffered groups, a low threshold makes
    // files × probes megabytes of reader churn and OOMs the shared
    // JVM (measured, twice). The positive controls below re-force
    // LOW thresholds on bounded-group queries to prove the disk
    // path itself.
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "1",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "512",
    "spark.sql.cartesianProductExec.buffer.in.memory.threshold" -> "1",
    "spark.sql.cartesianProductExec.buffer.spill.threshold" -> "4096",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1",
    // First value 1 = EVERY grouped aggregate takes the sort-based
    // fallback from its first row — that is the accumulation-order
    // claim under test. Second value = forced-spill frequency, so
    // file count ~ rows/threshold and the spill-merge READERS (1 MB
    // ReadAhead buffer each, opened together) cost file-count MB per
    // task: "1, 3" OOM'd on agg_cube's 4× grouping expansion, and
    // "1, 64" OOM'd on text_char_ngrams' ~150k-row per-task partial
    // agg (~2400 files ≈ 2.4 GB of reader buffers; both measured).
    // 4096 bounds the worst fixture aggregate (~1.5M rows at sf0.1)
    // to ~360 files/task while real memory-pressure spills remain
    // free to happen on top.
    "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "1, 4096",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withForcedSpill[T](extra: (String, String)*)(body: => T): T = {
    val all = forcedConfs ++ extra
    val conf = spark.conf
    val prev = all.map { case (k, _) => k -> conf.getOption(k) }
    all.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, SparkSpec.sf0001)
      .collect().map(norm).toSeq

  // The WHOLE declared surface, not a representative subset: the
  // forced confs only change behavior for queries that buffer (the
  // rest pay one pass of overhead), and suite-wide coverage means a
  // future operator cannot slip a buffered path in un-pinned.
  // Queries empty at sf0.001 (RegistrySpec.mayBeEmpty) are vacuous
  // here and re-proven on the smallest SF with rows below — same
  // structure as ShapeInvarianceSpec.
  private def compare(name: String, base: Seq[String],
      forced: Seq[String]): Unit = {
    val diffs = base.zip(forced).zipWithIndex.collect {
      case ((x, y), i) if x != y => s"row $i:\n  base=$x\n  spilled=$y"
    }
    assert(base.length == forced.length,
      s"$name: ${base.length} rows un-spilled vs ${forced.length} spilled")
    assert(diffs.isEmpty,
      s"$name differs under forced spilling (first 3):\n" +
        diffs.take(3).mkString("\n"))
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name: identical result when every buffer is forced to spill") {
      graft.Cache.clear(spark)
      val base = run(name)
      graft.Cache.clear(spark)
      val forced = withForcedSpill()(run(name))
      assert(base.nonEmpty || RegistrySpec.mayBeEmpty(name),
        s"$name empty at sf0.001 — test is vacuous")
      compare(name, base, forced)
    }
  }

  // Empty-at-toy families re-proven with rows: the geo pair family +
  // banded join at sf0.01, the dedup family (planted duplicates) at
  // sf0.1 — one pass per regime so shared pair-graph/signature
  // caches rebuild under forced spilling too.
  Seq("geo_co_presence", "geo_meeting_streaks", "geo_triangles",
    "join_range_banded").foreach { name =>
    test(s"$name: spill-invariant at sf0.01 (rows > 0)") {
      def go() = SparkEntry.queries(name)(spark, SparkSpec.sf001)
        .collect().map(norm).toSeq
      graft.Cache.clear(spark)
      val base = go()
      graft.Cache.clear(spark)
      val forced = withForcedSpill()(go())
      assert(base.nonEmpty, s"$name empty at sf0.01 — test is vacuous")
      compare(name, base, forced)
    }
  }

  test("dedup family: spill-invariant at sf0.1 (planted dups)") {
    val family = SparkEntry.queries.keys.filter(_.startsWith("dedup_"))
      .toSeq.sorted
    def pass(forced: Boolean): Map[String, Seq[String]] = {
      graft.Cache.clear(spark)
      def go() = family.map(n => n ->
        SparkEntry.queries(n)(spark, SparkSpec.sf01)
          .collect().map(norm).toSeq).toMap
      if (forced) withForcedSpill()(go()) else go()
    }
    val base = pass(forced = false)
    val forced = pass(forced = true)
    val empty = family.filter(base(_).isEmpty)
    assert(empty.isEmpty, s"empty at sf0.1 (vacuous): $empty")
    family.foreach(n => compare(n, base(n), forced(n)))
  }

  // Positive controls: the knobs must actually reach the operators,
  // or the suite-wide green above proves nothing.

  test("positive control: forced window query spills to disk") {
    graft.Cache.clear(spark)
    // NOT window_rank: its `rn <= 3` filter triggers Spark 4's
    // WindowGroupLimit pushdown, so WindowExec buffers ≤ 3 rows per
    // group and no threshold can trip (measured — a useful fact on
    // its own: the top-k window pattern self-limits its buffers).
    // window_moving has no group limit; its per-user event groups
    // (~20 rows) spill at a 4-row threshold, and the sliding-frame
    // iterators open once per group — no SMJ-style per-probe reader
    // reopen, so no allocation storm.
    val (_, spilled) = metered(withForcedSpill(
      "spark.sql.windowExec.buffer.spill.threshold" -> "4")(
      run("window_moving")))
    assert(spilled > 0,
      "window spill thresholds are NOT reaching WindowExec — " +
        "the window rows of this suite are vacuous")
  }

  test("positive control: forced join executes as SortMergeJoin and spills") {
    // TEST-LOCAL user-equi self-join with the range as a residual —
    // the pre-r18 join_theta_range shape, kept here BECAUSE its
    // buffered per-user groups (~hundreds of events) exceed a 64-row
    // spill threshold. The shipped query is time-banded precisely so
    // its per-(user, minute) groups stay tiny (the 100x slope fix,
    // PlanSpec pin), which makes it useless as a spill vehicle.
    graft.Cache.clear(spark)
    import org.apache.spark.sql.functions.{col, count, expr, lit}
    val (plan, spilled) = metered(withForcedSpill(
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64") {
      val e = graft.Tables.events(spark, SparkSpec.sf0001)
        .select("user_id", "ts", "event_type")
      val q = e.alias("a")
        .join(e.alias("b"),
          col("a.user_id") === col("b.user_id")
            && col("a.ts") < col("b.ts")
            && col("b.ts") <= col("a.ts") + expr("INTERVAL 60 SECONDS")
            && col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("type_a", "type_b")
      q.collect()
      q.queryExecution.executedPlan.toString
    })
    assert(plan.contains("SortMergeJoin"),
      s"broadcast disable is NOT reaching the planner — " +
        s"the user-equi stressor did not execute as SMJ:\n$plan")
    assert(spilled > 0,
      "SMJ buffer thresholds are NOT reaching SortMergeJoinExec — " +
        "the join rows of this suite are vacuous")
  }

  test("positive control: forced cartesian product spills") {
    // join_cross buffers 5 rows; threshold 2 spills them — bounded
    // files, bounded probes.
    graft.Cache.clear(spark)
    val (_, spilled) = metered(withForcedSpill(
      "spark.sql.cartesianProductExec.buffer.spill.threshold" -> "2")(
      run("join_cross")))
    assert(spilled > 0,
      "cartesian buffer thresholds are NOT reaching " +
        "CartesianProductExec — the cross-join row is vacuous")
  }

  test("positive control: forced hash-agg fallback spills to disk") {
    // agg_pricing_summary: ~6k lineitem rows through a grouped agg;
    // forcing a spill every 64 processed rows makes ~95 spill files
    // per task (bounded reader buffers) and nonzero spilled bytes —
    // proof the testFallbackStartsAt conf reaches HashAggregateExec,
    // which the suite-wide "1, 4096" equality pass relies on.
    graft.Cache.clear(spark)
    val (_, spilled) = metered(withForcedSpill(
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "1, 64")(
      run("agg_pricing_summary")))
    assert(spilled > 0,
      "agg fallback thresholds are NOT reaching HashAggregateExec — " +
        "the aggregate rows of this suite are vacuous")
  }

  test("negative control: un-forced window query does not spill") {
    graft.Cache.clear(spark)
    val (_, spilled) = metered(run("window_rank"))
    assert(spilled == 0,
      s"un-forced baseline spilled $spilled bytes at sf0.001 — the " +
        "meter is counting foreign work and the controls are unsound")
  }
}
