package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Category A — scans / sources (SURVEY.md §2.1.A).
  *
  * These pin the scan-side contract Catalyst must deliver at scale:
  * column pruning (`ReadSchema` shows only selected columns) and
  * predicate pushdown (`PushedFilters` reaches the parquet reader →
  * row-group skipping at 100 TB). Semi-structured payloads are parsed
  * with `from_json` (codegen'd) — never a UDF.
  */
object Scans {

  val queries: Map[String, Q] = Map(
    // Full scan, stable order. The trivial baseline every source must pass.
    "scan_parquet" -> ((s, d) =>
      Tables.nation(s, d).orderBy("n_nationkey")),

    // Column pruning: only 2 of 10 lineitem columns reach the reader.
    "scan_projection" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // Predicate pushdown: shipdate filter lands in PushedFilters.
    "scan_filter_pushdown" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // Parse the JSON payload column into typed flat columns.
    "source_json_payload" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .orderBy("event_id"))
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "source_json_payload" ->
      """SELECT event_id, event_type,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
