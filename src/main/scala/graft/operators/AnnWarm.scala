package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (not part of the declared surface; safe to
  * delete): measures the ann family under the BENCH's release
  * semantics — time the query, clear its cache group (as Bench's
  * release schedule does after ann_ivf / dedup_embed_ann), repeat —
  * so each rep pays whatever a released pass pays. Before the r17
  * disk-backed index this was the full signature/Lloyd rebuild
  * (~2.3-2.7 s for ann_ivf at sf0.1); with the artifact it should be
  * a bucketed parquet re-open plus the query itself.
  */
object AnnWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n =>
      try { graft.Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    val plan = Seq(
      "ann_lsh" -> "sim.lsh",
      "ann_ivf" -> "sim.ivf",
      "dedup_embed_ann" -> "sim.lsh")
    plan.foreach { case (q, _) => // pass 0: build indexes + JIT
      graft.SparkEntry.queries(q)(spark, sfDir).count()
    }
    (1 to reps).foreach { rep =>
      val line = plan.map { case (q, release) =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Cache.clear(spark, release)
        f"$q=$dt%.2f"
      }.mkString(" ")
      println(s"rep$rep: $line")
    }
    spark.stop()
  }
}
