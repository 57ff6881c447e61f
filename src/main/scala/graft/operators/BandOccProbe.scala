package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (safe to delete): band-bucket occupancy of the
  * minhash LSH at a documents dir — who makes the candidate explosion
  * (sum k*(k-1)/2 over (band,h0,h1) groups) at the failing decade. */
object BandOccProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10_doc")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bands = Dedup.minhashBands(spark, d)
    val keys = "band" +: (0 until Dedup.MinhashRows).map(r => s"h$r")
    val occ = bands.groupBy(keys.head, keys.tail: _*).count()
    occ.persist()
    val pairs = occ.agg(sum(expr("count * (count - 1) / 2"))).head().get(0)
    println(s"OCC raw-candidate pairs = $pairs")
    println("top groups:")
    occ.orderBy(col("count").desc).limit(10).collect().foreach(println)
    // size distribution
    occ.groupBy(expr("least(count, 100)").as("sz")).count()
      .orderBy(col("sz").desc).limit(12).collect().foreach(println)
    spark.stop()
  }
}
