import org.apache.spark.sql.{DataFrame, SparkSession}

/** graft — a Spark-native analytics engine with the query and
  * data-processing capabilities of EarthScientist/ShippingLanes
  * (AIS-style event analytics: ingest, clean, dedup, sessionize,
  * aggregate), extended with LLM-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal columns).
  *
  * Design: declarative DataFrame plans only — Catalyst owns pushdown,
  * pruning, join selection, AQE; the engine introduces no custom IR.
  * Every operator is shuffle-parallel (no driver-side loops), so the
  * same code that runs on local[32] at sf0.1 scales to a multi-
  * executor cluster at 100 TB by partitioning alone.
  */
package object graft {
  /** A registered query: (session, scale-factor dir) => lazy DataFrame.
    * The contract key type of [[graft.SparkEntry.queries]]. */
  type Q = (SparkSession, String) => DataFrame
}
