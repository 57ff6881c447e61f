package graft
import org.apache.spark.sql.SparkSession
object Floor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = EngineConf.tuned(SparkSession.builder()).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // warmup
    (1 to 3).foreach(_ => Tables.lineitem(spark, d).count())
    def med(f: => Unit): Double = {
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted; ts(3)
    }
    println(f"floor_count_cached_df:   ${med(Tables.lineitem(spark, d).count())}%.3f s (parquet count, memoized df)")
    println(f"floor_groupby:           ${med(Tables.lineitem(spark, d).groupBy("l_returnflag").count().count())}%.3f s (1-exchange agg)")
    println(f"floor_join_broadcast:    ${med(Tables.lineitem(spark, d).join(Tables.part(spark, d), Tables.lineitem(spark, d)("l_partkey") === Tables.part(spark, d)("p_partkey")).count())}%.3f s")
    println(f"floor_range:             ${med(spark.range(1000).count())}%.3f s (no files)")
    spark.stop()
  }
}
