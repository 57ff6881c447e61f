package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming twins of the Category-H batch operators
  * (SURVEY.md §2.1.H): the same event-stream semantics expressed over
  * an unbounded source with watermarks.
  *
  * Each transform takes ANY events-shaped DataFrame — batch or
  * streaming — so the batch queries in operators.EventOps and these
  * streaming twins share semantics by construction; StreamingSpec
  * feeds a MemoryStream through them and asserts batch == stream.
  *
  * Production shape at 100 TB: readStream over a partitioned file/
  * Kafka source, watermark bounds state, session/dedup state is
  * per-key (user_id) so it scales horizontally with shuffle
  * partitions.
  */
object Streams {

  /** File-source entry: stream the events table from a directory of
    * parquet files (schema pinned from a batch read so the stream
    * never infers). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.Tables.events(spark, dir).schema
    spark.readStream.schema(schema)
      .parquet(s"$dir/events.parquet")
  }

  /** 1-hour tumbling counts+sums per event type (twin of
    * stream_tumbling). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("n"), col("total_value"))

  /** 1-hour windows sliding every 15 min (twin of stream_sliding). */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))

  /** 30-min-gap sessionization per user via session_window (twin of
    * stream_session's lag+running-sum construction). */
  def session(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("t_start"), max("ts").as("t_end"),
        round(sum("value"), 2).as("total_value"))
      .select(col("user_id"), col("n_events"),
        col("t_start"), col("t_end"), col("total_value"))

  /** Keep-first dedup by (user_id, event_type) within the watermark
    * (twin of stream_dedup; streaming keeps the first ARRIVED row,
    * which equals first-by-ts when the feed is ts-ordered). */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type", "event_id", "ts")

  /** Watermark late-data drop (twin of stream_late_filter): events
    * older than the watermark delay behind the max seen ts are
    * discarded by the engine before any stateful op. */
  def lateFiltered(events: DataFrame, delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("event_id"), col("ts"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select("event_id", "ts", "event_type")
}
