package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (safe to delete): measures the sharded-index
  * prototype (Similarity.shardedAnnTopK) against the unsharded path
  * at a scale-fixture dir and verifies equality DISTRIBUTEDLY
  * (exceptAll both ways — at 2M vectors the 6M-row result can't
  * collect into a driver-side compare). Reports per-path cold (index
  * build included) and warm (artifact re-open) seconds.
  *
  * Usage: runMain graft.operators.ShardProbe <dir> [shards]
  */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf100_ed")
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(2)
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
