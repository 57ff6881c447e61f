package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Batch/stream parity (SURVEY.md §5 "streaming twins"): feed the
  * sf0.001 events through a MemoryStream and assert each streaming
  * transform agrees with its batch twin from operators.EventOps. */
class StreamingSpec extends SparkSpec {

  private lazy val batchEvents: Seq[Ev] = {
    graft.Tables.events(spark, SparkSpec.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
  }

  /** Run a streaming transform over all sf0.001 events in one batch,
    * return the materialized sink table. */
  private def runStream(name: String, mode: String,
      f: DataFrame => DataFrame): DataFrame = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(batchEvents)
    val q = f(ms.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("tumbling: stream == batch") {
    val stream = runStream("t_tumbling", "complete",
      Streams.tumbling)
    val batch = graft.operators.EventOps.queries("stream_tumbling")(
      spark, SparkSpec.sf0001)
    assert(asSet(stream) == asSet(batch))
  }

  test("sliding: stream == batch") {
    val stream = runStream("t_sliding", "complete", Streams.sliding)
    val batch = graft.operators.EventOps.queries("stream_sliding")(
      spark, SparkSpec.sf0001)
    assert(asSet(stream) == asSet(batch))
  }

  test("session_window: stream == batch lag+running-sum sessionization") {
    val stream = runStream("t_session", "complete", Streams.session)
    val batch = graft.operators.EventOps.queries("stream_session")(
      spark, SparkSpec.sf0001)
      .select("user_id", "n_events", "t_start", "t_end", "total_value")
    assert(asSet(stream) == asSet(batch))
  }

  test("flatMapGroupsWithState sessions == batch sessions minus open ones") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(batchEvents)
    val typed = ms.toDF().as[EventRow]
    val q = Streams.statefulSessions(typed).writeStream
      .format("memory").queryName("t_stateful").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = asSet(spark.table("t_stateful"))
    // batch truth, excluding each user's LAST session (still open in
    // the stream's state when the batch ends)
    val batch = graft.operators.EventOps.queries("stream_session")(
      spark, SparkSpec.sf0001)
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("session_id"))
    val closed = batch.join(lastPerUser, Seq("user_id", "session_id"),
        "left_anti")
      .select("user_id", "n_events", "t_start", "t_end", "total_value")
    assert(streamed == asSet(closed))
  }

  test("file-source stream: tumbling over parquet dir == batch") {
    val src = Streams.eventsStream(spark, SparkSpec.sf0001)
    val q = Streams.tumbling(src).writeStream
      .format("memory").queryName("t_file").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val batch = graft.operators.EventOps.queries("stream_tumbling")(
      spark, SparkSpec.sf0001)
    assert(asSet(spark.table("t_file")) == asSet(batch))
  }

  test("dedup: stream emits one row per (user_id, event_type) key") {
    val stream = runStream("t_dedup", "append", Streams.dedup)
    val batch = graft.operators.EventOps.queries("stream_dedup")(
      spark, SparkSpec.sf0001)
    // Keys must match exactly; survivor choice within a micro-batch is
    // arrival-order-dependent, so compare key sets + cardinality.
    val sKeys = asSet(stream.select("user_id", "event_type"))
    val bKeys = asSet(batch.select("user_id", "event_type"))
    assert(sKeys == bKeys)
    assert(stream.count() == batch.count())
  }
}
