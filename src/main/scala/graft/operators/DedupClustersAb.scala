package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (safe to delete): drift-cancelled interleaved
  * A/B for the dedup_clusters quiet-warm creep (r16 verdict item 2:
  * 1.87 → 2.27 s r15→r16). The two r16 engine-conf changes are both
  * dynamic SQL confs, so ONE session interleaves all arms per rep —
  * ambient load hits every arm equally:
  *   base    — shipped conf (cache AQE on, initialPartitionNum 256)
  *   cacheoff— canChangeCachedPlanOutputPartitioning=false (r15 regime)
  *   init32  — initialPartitionNum=32 (r15 regime)
  * Each timing runs under Bench's release semantics (dedup. cache
  * cleared first, so the minhash pair-graph rebuild is included —
  * that is what pass2 pays for this query).
  */
object DedupClustersAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n =>
      try { graft.Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    val CACHE = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val INIT = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val arms = Seq(
      ("base", () => { spark.conf.set(CACHE, "true"); spark.conf.set(INIT, "256") }),
      ("cacheoff", () => { spark.conf.set(CACHE, "false"); spark.conf.set(INIT, "256") }),
      ("init32", () => { spark.conf.set(CACHE, "true"); spark.conf.set(INIT, "32") }))
    // cold pass: JIT + table memo
    graft.SparkEntry.queries("dedup_clusters")(spark, sfDir).count()
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { rep =>
      val line = arms.map { case (name, set) =>
        set()
        graft.Cache.clear(spark, "dedup.")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("dedup_clusters")(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        acc(name) = dt :: acc(name)
        f"$name=$dt%.2f"
      }.mkString(" ")
      println(s"rep$rep: $line")
    }
    arms.foreach { case (name, _) =>
      val xs = acc(name).sorted
      println(f"$name%-9s min=${xs.head}%.2f median=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
