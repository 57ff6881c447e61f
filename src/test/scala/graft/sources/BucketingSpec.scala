package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-level proof that bucketing removes the join shuffle — the
  * co-location strategy for repeated big-big joins at scale. */
class BucketingSpec extends SparkSpec {

  test("equi-join of co-bucketed tables plans without Exchange") {
    val sf = SparkSpec.sf0001
    // force SMJ so the bucketing (not a broadcast) is what's proven
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody(sf)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }

  private def bucketedJoinBody(sf: String): Unit = {
    // the warehouse dir outlives the in-memory catalog across JVM
    // runs — clear stale table locations first
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    IO.writeBucketed(graft.Tables.orders(spark, sf),
      "orders_b", buckets = 4, bucketCols = Seq("o_orderkey"))
    IO.writeBucketed(graft.Tables.lineitem(spark, sf),
      "lineitem_b", buckets = 4, bucketCols = Seq("l_orderkey"))

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // Bucketed SMJ: no shuffle before the join (the only exchange
    // allowed is the one for the final groupBy).
    val joinPart = plan.split("SortMergeJoin")(1)
    assert(plan.contains("SortMergeJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(500))
    if (plan.contains("SortMergeJoin")) {
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"join input was shuffled:\n${joinPart.take(800)}")
    }
    // and the result is right: every lineitem matches one order
    val total = joined.agg(sum("n")).collect()(0).getLong(0)
    assert(total == graft.Tables.lineitem(spark, sf).count())
  }
}
