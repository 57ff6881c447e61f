package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch stage profiler for the ANN warm tail (not part of the
  * declared surface; safe to delete). Times each midpoint of the
  * ann_ivf / ann_lsh / dedup_clusters pipelines separately so the
  * warm cost can be attributed to a stage instead of guessed. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep (cold caches) ===")
      graft.Cache.clear(spark)
      t("vecs build")(Similarity.vecs(spark, sfDir).count())
      val n = graft.EngineConf.parquetRowCount(spark, s"$sfDir/embeddings.parquet")
      val k = Similarity.ivfCells(n)
      t("ivf index (means+assigned)") {
        val (a, m) = Similarity.ivfIndex(spark, sfDir, k)
        m.count(); a.count()
      }
      t("ann_ivf full")(
        graft.SparkEntry.queries("ann_ivf")(spark, sfDir).count())
      graft.Cache.clear(spark, "sim.ivf")
      t("ann_ivf full (vecs warm)")(
        graft.SparkEntry.queries("ann_ivf")(spark, sfDir).count())
      t("lsh buckets build")(Similarity.lshBuckets(
        spark, sfDir, Similarity.LshTables,
        Similarity.lshBits(n),
        Similarity.LshSeed).count())
      t("ann_lsh full")(
        graft.SparkEntry.queries("ann_lsh")(spark, sfDir).count())
      t("dedup_embed_ann full")(
        graft.SparkEntry.queries("dedup_embed_ann")(spark, sfDir).count())
      graft.Cache.clear(spark)
      // shingles is private; pairs covers it
      t("dedup minhashPairs")(
        Dedup.minhashPairs(spark, sfDir).count())
      t("dedup_clusters full")(
        graft.SparkEntry.queries("dedup_clusters")(spark, sfDir).count())
      t("events_concurrency")(
        graft.SparkEntry.queries("events_concurrency")(spark, sfDir).count())
      graft.Cache.clear(spark, "events.")
      t("geo_zone_components")(
        graft.SparkEntry.queries("geo_zone_components")(spark, sfDir).count())
      graft.Cache.clear(spark)
    }
    spark.stop()
  }
}
