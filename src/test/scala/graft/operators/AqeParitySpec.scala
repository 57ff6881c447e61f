package graft.operators

import graft.{RowNorm, SparkEntry, SparkSpec}

/** AQE on/off parity (round 14).
  *
  * Adaptive Query Execution re-plans at runtime: it coalesces
  * post-shuffle partitions, splits skewed ones, and switches join
  * strategies (SMJ → broadcast) from observed sizes. All three move
  * rows between tasks and change the order rows meet accumulators —
  * and at 100 TB AQE's decisions differ run to run with observed
  * stage sizes, so any AQE-sensitivity is nondeterminism in
  * production even if each local run looks stable. This spec pins a
  * representative query per operator family as identical (9-digit
  * bar) with `spark.sql.adaptive.enabled` on (the suite default —
  * Spark 4 ships AQE on) and off, caches cleared between so
  * persisted intermediates rebuild under both regimes.
  *
  * ShapeInvarianceSpec varies the cluster shape UNDER AQE;
  * this spec varies whether the runtime re-planner exists at all —
  * the executed plans genuinely differ (negative control: the
  * `AdaptiveSparkPlan` node must appear exactly when AQE is on).
  */
class AqeParitySpec extends SparkSpec {

  private def norm = RowNorm.norm _

  private def withAqe[T](on: Boolean)(body: => T): T = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", on.toString)
    try body
    finally prev match {
      case Some(v) => conf.set("spark.sql.adaptive.enabled", v)
      case None => conf.unset("spark.sql.adaptive.enabled")
    }
  }

  // One per family, weighted toward the ops where AQE bites:
  // multi-join chains, skew salting, windows over shuffles, the
  // blocked dedup/ANN pipelines (sf0.1 where the toy SF is empty).
  private val targets = Seq(
    "agg_pricing_summary" -> SparkSpec.sf0001,
    "agg_rollup" -> SparkSpec.sf0001,
    "join_5way" -> SparkSpec.sf0001,
    "join_skew_salted" -> SparkSpec.sf0001,
    "join_theta_range" -> SparkSpec.sf0001,
    "window_rank" -> SparkSpec.sf0001,
    "events_concurrency" -> SparkSpec.sf0001,
    "events_funnel" -> SparkSpec.sf0001,
    "stream_session" -> SparkSpec.sf0001,
    "text_tfidf" -> SparkSpec.sf0001,
    "text_contamination" -> SparkSpec.sf0001,
    "geo_voyages" -> SparkSpec.sf0001,
    "geo_zone_counts" -> SparkSpec.sf0001,
    "topk_global" -> SparkSpec.sf0001,
    "set_except_all" -> SparkSpec.sf0001,
    "sample_hash_split" -> SparkSpec.sf0001,
    "ann_lsh" -> SparkSpec.sf0001,
    "similarity_topk_per_query" -> SparkSpec.sf0001,
    "dedup_minhash" -> SparkSpec.sf01,
    "dedup_clusters" -> SparkSpec.sf01)

  targets.foreach { case (name, sf) =>
    test(s"$name: identical with AQE on and off") {
      def pass(on: Boolean): Seq[String] = {
        graft.Cache.clear(spark)
        withAqe(on)(
          SparkEntry.queries(name)(spark, sf).collect().map(norm).toSeq)
      }
      val on = pass(on = true)
      val off = pass(on = false)
      assert(on.nonEmpty, s"$name empty at $sf — parity test is vacuous")
      val diffs = on.zip(off).zipWithIndex.collect {
        case ((x, y), i) if x != y => s"row $i:\n  aqe-on=$x\n  aqe-off=$y"
      }
      assert(on.length == off.length,
        s"$name: ${on.length} rows with AQE vs ${off.length} without")
      assert(diffs.isEmpty,
        s"$name differs with AQE on vs off (first 3):\n" +
          diffs.take(3).mkString("\n"))
    }
  }

  test("negative control: AQE really toggles the executed plan") {
    def planOf(on: Boolean): String = withAqe(on) {
      val q = graft.Tables.table(spark, SparkSpec.sf0001, "orders")
        .groupBy("o_orderstatus")
        .agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      q.collect()
      q.queryExecution.executedPlan.toString
    }
    val pOn = planOf(on = true)
    val pOff = planOf(on = false)
    assert(pOn.contains("AdaptiveSparkPlan") &&
      !pOff.contains("AdaptiveSparkPlan"),
      "the AQE conf is NOT reaching execution — the parity rows above " +
        s"prove nothing\n  on=$pOn\n  off=$pOff")
  }
}
