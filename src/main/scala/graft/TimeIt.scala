package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench: time the named queries (count() action) with the
  * Bench session shape, printing per-run seconds. Unlike Bench this
  * runs a chosen subset several times, so regressions vs one-off
  * machine noise are distinguishable (single runs swing ±40% here).
  *
  * Usage: runMain graft.TimeIt [sfDir] [reps] [query ...]
  */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("similarity_topk_per_query", "similarity_knn",
        "dedup_embed", "dedup_near", "dedup_minhash", "ann_lsh", "ann_ivf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n =>
      try { Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    names.foreach { n =>
      val ts = (1 to reps).map { _ =>
        // Construction and action timed SEPARATELY: a query whose
        // construction runs Spark jobs (cache-threshold counts, the
        // ConstructionSpec whitelist) shows its split here, which
        // Bench's single number can't.
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        val rows = df.count()
        val t2 = System.nanoTime()
        f"${(t1 - t0) / 1e9}%.2f+${(t2 - t1) / 1e9}%.2f"
      }
      println(f"$n%-28s ${ts.mkString("  ")}  s (construct+action)")
    }
    spark.stop()
  }
}
