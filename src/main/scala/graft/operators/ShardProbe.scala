package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (safe to delete): measures the sharded-index
  * prototype (Similarity.shardedAnnTopK) against the unsharded path
  * at a scale-fixture dir and verifies equality DISTRIBUTEDLY
  * (exceptAll both ways — at 2M vectors the 6M-row result can't
  * collect into a driver-side compare). Reports per-path cold (index
  * build included) and warm (artifact re-open) seconds.
  *
  * Usage: runMain graft.operators.ShardProbe <dir> [shards] [mode]
  * mode: both (default — fixture scale), shard (sharded arms only —
  * at 2M one arm per JVM keeps the 16g heap honest: the r18 run
  * showed unsharded-cold leftovers OOM the next arm in-process).
  */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf100_ed")
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val mode = args.drop(2).headOption.getOrElse("both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.EngineConf.parquetRowCount(spark, s"$d/embeddings.parquet")
    val (tables, bits, seed) =
      (Similarity.LshTables, Similarity.lshBits(n), Similarity.LshSeed)
    println(s"ShardProbe $d n=$n shards=$shards bits=$bits")
    def timed(tag: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$rows")
      rows
    }
    def base() = Similarity
      .annTopK(spark, d, tables, bits, seed, Similarity.AnnH1Tables)
    def shard() = Similarity.shardedAnnTopK(spark, d, shards, tables,
      bits, seed, Similarity.AnnH1Tables)
    if (mode == "dispatch") {
      // The AUTO-ROUTED case: run annTopK itself and let the heap-
      // derived bound pick the route. At 2M vectors on an 8 GiB JVM
      // the bound reads ~1.25M → S=2 sharded artifacts — the heap
      // where the unsharded broadcast attach is a measured OOM.
      println("attachBroadcastMaxRows=" +
        s"${Similarity.attachBroadcastMaxRows(spark)}")
      timed("dispatched annTopK cold")(
        Similarity.annTopK(spark, d, tables, bits, seed,
          Similarity.AnnH1Tables).count())
      graft.Cache.clear(spark, "sim.")
      timed("dispatched annTopK warm")(
        Similarity.annTopK(spark, d, tables, bits, seed,
          Similarity.AnnH1Tables).count())
      spark.stop(); return
    }
    if (mode == "shard") {
      // Deployment shape at scale: each shard's top-k is its own JOB
      // (one at a time — its broadcasts live only for its duration),
      // materialized narrow; the final re-rank reads the k·S dumps.
      // The one-query composed form (mode=both) holds all shards'
      // relations at once and OOMs a 16g heap at 2M (PLANS.md r18).
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val scratch =
        s"/tmp/graft_shardprobe/p${ProcessHandle.current().pid()}"
      (0 until shards).foreach { i =>
        timed(s"shard $i top-k job")(
          { val df = Similarity.shardTopK(spark, d, i, shards, tables,
              bits, seed, Similarity.AnnH1Tables)
            df.write.mode("overwrite").parquet(s"$scratch/s$i")
            spark.read.parquet(s"$scratch/s$i").count() })
        graft.Cache.clear(spark, "sim.")
      }
      val w = Window.partitionBy("v1")
        .orderBy(col("cos").desc, col("v2"))
      timed("union re-rank job")(
        (0 until shards).map(i => spark.read.parquet(s"$scratch/s$i"))
          .reduce(_ unionAll _)
          .withColumn("rk", dense_rank().over(w))
          .filter(col("rk") <= 3)
          .dropDuplicates("v1", "v2")
          .count())
      spark.stop(); return
    }
    timed("unsharded cold")(base().count())
    graft.Cache.clear(spark, "sim.")
    timed("unsharded warm")(base().count())
    timed(s"sharded($shards) cold")(shard().count())
    graft.Cache.clear(spark, "sim.")
    timed(s"sharded($shards) warm")(shard().count())
    // Equality check via materialized dumps: exceptAll over the two
    // LIVE window plans trips a Catalyst internal error
    // (ATTRIBUTE_NOT_FOUND on the rank attr in the rewritten
    // except-all aggregate), so compare the re-read parquet instead —
    // same rows, no combined-plan rewrite.
    val scratch = s"/tmp/graft_shardprobe/p${ProcessHandle.current().pid()}"
    base().write.mode("overwrite").parquet(s"$scratch/base")
    shard().write.mode("overwrite").parquet(s"$scratch/shard")
    val b = spark.read.parquet(s"$scratch/base")
    val sh = spark.read.parquet(s"$scratch/shard")
    val extra = timed("sharded \\ unsharded")(sh.exceptAll(b).count())
    val missing = timed("unsharded \\ sharded")(b.exceptAll(sh).count())
    println(s"EQUAL=${extra == 0 && missing == 0}")
    spark.stop()
    if (extra != 0 || missing != 0) sys.exit(1)
  }
}
