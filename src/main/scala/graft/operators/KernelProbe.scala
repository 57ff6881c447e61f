package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.vecDot

/** Scratch kernel attribution for the ANN scoring stage (not part of
  * the declared surface; safe to delete): splits the candidate
  * pipeline's warm cost into pair GENERATION, +dot-product, and
  * +top-k window, so kernel work is separated from join/sort
  * machinery before optimizing either.
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }

    val n = graft.EngineConf.parquetRowCount(spark, s"$sfDir/embeddings.parquet")
    val k = Similarity.ivfCells(n)
    // warm all caches once
    graft.SparkEntry.queries("ann_ivf")(spark, sfDir).count()
    val ranked = Similarity.ivfRanked(spark, sfDir, k, Similarity.IvfLloydIters)
    val v = Similarity.vecs(spark, sfDir)
    val probes = ranked.filter(col("prk") <= Similarity.ivfNprobe(k))
      .select(col("vec_id").as("v1"), col("pcell"))
    val members = ranked.filter(col("prk") === 1)
      .select(col("vec_id").as("v2"), col("pcell"))
    def cand = probes.join(members, Seq("pcell"))
      .filter(col("v1") =!= col("v2")).select("v1", "v2")
    def scored = cand
      .join(v.select(col("vec_id").as("v1"), col("embedding").as("ea"),
        col("nsq").as("na")), "v1")
      .join(v.select(col("vec_id").as("v2"), col("embedding").as("eb"),
        col("nsq").as("nb")), "v2")
      .withColumn("cos", round(
        vecDot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")), 4))
      .select("v1", "v2", "cos")
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      t("pairs only (join, no arrays)")(cand.count())
      t("pairs + embedding attach (no dot)")(
        cand.join(v.select(col("vec_id").as("v1"),
            col("embedding").as("ea"), col("nsq").as("na")), "v1")
          .join(v.select(col("vec_id").as("v2"),
            col("embedding").as("eb"), col("nsq").as("nb")), "v2")
          .select("v1", "v2").count())
      t("+ vec_dot agg (no round, no window)")(
        scored.agg(sum("cos")).collect().head)
      t("full ann_ivf warm")(
        graft.SparkEntry.queries("ann_ivf")(spark, sfDir).count())
    }
    spark.stop()
  }
}
