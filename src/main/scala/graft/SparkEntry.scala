package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Central registry: each operator category contributes a
  * (queries, oracles) pair; keys are SURVEY.md §2.1 inventory names.
  */
object SparkEntry {

  private val registry: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (operators.Scans.queries, operators.Scans.oracles),
    (operators.Filters.queries, operators.Filters.oracles),
    (operators.Joins.queries, operators.Joins.oracles),
    (operators.Aggregates.queries, operators.Aggregates.oracles),
    (operators.SetsSorts.queries, operators.SetsSorts.oracles),
    (operators.Windows.queries, operators.Windows.oracles),
    (operators.EventOps.queries, operators.EventOps.oracles),
    (operators.Functions.queries, operators.Functions.oracles),
    (operators.TextOps.queries, operators.TextOps.oracles),
    (operators.Dedup.queries, operators.Dedup.oracles),
    (operators.Similarity.queries, operators.Similarity.oracles),
    (operators.Multimodal.queries, operators.Multimodal.oracles),
    (operators.Udx.queries, operators.Udx.oracles),
    (operators.Sampling.queries, operators.Sampling.oracles),
    (operators.GeoOps.queries, operators.GeoOps.oracles)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, Q] =
    registry.iterator.map(_._1).reduce(_ ++ _)

  /** DuckDB-runnable twin for each oracle-checked query. Keys absent
    * here (but present in `queries`) get the weaker rows-only check. */
  val oracleSql: Map[String, String] =
    registry.iterator.map(_._2).reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. A cross-subsystem composite: star-schema broadcast joins
    * → revenue aggregation → window rank of nations within region —
    * one pipeline through scans, joins, aggs, and windows. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val revenue = Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        countDistinct("o_orderkey").as("n_orders"))
    val w = Window.partitionBy("r_name")
      .orderBy(col("revenue").desc, col("n_name"))
    revenue
      .withColumn("rank_in_region", row_number().over(w))
      .orderBy("r_name", "rank_in_region")
  }
}
