package graft

import org.apache.spark.sql.SparkSession

/** ANN quality audit: recall@3 of ann_lsh / ann_ivf against the
  * brute-force twin, and dedup_embed_ann coverage vs dedup_embed, at
  * each scale factor. Recall is DETERMINISTIC per dataset (fixed-seed
  * hyperplanes / seeds), so a green run here holds in the driver.
  *
  * Usage: runMain graft.RecallCheck [sfDir ...]
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val brute = SparkEntry.queries("similarity_topk_per_query")(spark, d)
        .filter("rk <= 3").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      def recall(name: String): Double = {
        val ann = SparkEntry.queries(name)(spark, d).collect()
          .map(r => (r.getLong(0), r.getLong(2))).toSet
        (brute & ann).size.toDouble / brute.size
      }
      val exact = SparkEntry.queries("dedup_embed")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val blocked = SparkEntry.queries("dedup_embed_ann")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$d  ann_lsh=${recall("ann_lsh")}%.3f" +
        f"  ann_ivf=${recall("ann_ivf")}%.3f" +
        f"  embed_ann: ${blocked.size}/${exact.size}" +
        s"  missed=${(exact -- blocked).size}" +
        s"  extra=${(blocked -- exact).size}")
    }
    spark.stop()
  }
}
