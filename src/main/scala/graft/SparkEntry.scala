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
    (operators.Sampling.queries, operators.Sampling.oracles)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, Q] =
    registry.iterator.map(_._1).reduce(_ ++ _)

  /** DuckDB-runnable twin for each oracle-checked query. Keys absent
    * here (but present in `queries`) get the weaker rows-only check. */
  val oracleSql: Map[String, String] =
    registry.iterator.map(_._2).reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")
}
