package graft.operators

import graft.{Cache, EngineConf}
import org.apache.spark.sql.SparkSession

/** Dev tool: empirical sweep of IVF parameters (cells, Lloyd
  * iterations, probed fraction) measuring ann_ivf recall@3 vs the
  * brute-force twin with the exact declared pipeline, so the
  * constants in [[Similarity]] are measured, not guessed.
  *
  * Usage: runMain graft.operators.IvfSweep [sfDir ...]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fractions = Seq(0.15, 0.25, 0.35, 0.5, 0.7)
    dirs.foreach { d =>
      val n = EngineConf.parquetRowCount(spark, s"$d/embeddings.parquet")
      val brute = Similarity.queries("similarity_topk_per_query")(spark, d)
        .filter("rk <= 3").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      println(s"== $d  n=$n")
      for {
        k <- Seq(math.sqrt(n / 2.0).ceil.toInt,
          math.sqrt(2.0 * n).ceil.toInt)
        iters <- Seq(1, 3)
      } {
        val line = fractions.map { f =>
          val nprobe = math.max(2, math.ceil(k * f).toInt)
          val t0 = System.nanoTime()
          val ann = Similarity.ivfTopK(spark, d, k, nprobe, iters)
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          val dt = (System.nanoTime() - t0) / 1e9
          val recall = (brute & ann).size.toDouble / brute.size
          f"f=$f%.2f r=$recall%.3f (${dt}%4.1fs)"
        }.mkString("  ")
        println(f"k=$k%-3d iters=$iters  $line")
        Cache.clear(spark, "sim.ivf")
      }
      Cache.clear(spark)
    }
    spark.stop()
  }
}
