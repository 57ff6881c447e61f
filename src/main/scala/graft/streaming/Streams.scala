package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the custom-state operators. */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Open-session state carried across micro-batches (epoch micros). */
case class SessionState(start: Long, last: Long, n: Long, sum: Double)

/** Emitted closed session. */
case class SessionOut(user_id: Long, n_events: Long,
    t_start: java.sql.Timestamp, t_end: java.sql.Timestamp,
    total_value: Double)

/** Funnel progression state: earliest qualifying epoch-micros per
  * stage, -1 = not reached. */
case class FunnelState(t1: Long, t2: Long, t3: Long)

/** Emitted stage completion. */
case class FunnelOut(user_id: Long, stage: String, ts: java.sql.Timestamp)

/** Open-voyage state: origin zone, last report micros, last zone,
  * points so far. */
case class VoyageState(oZone: String, last: Long, dZone: String, n: Long)

/** Emitted closed voyage with its OD endpoints. */
case class VoyageOut(user_id: Long, o_zone: String, d_zone: String,
    n_points: Long)

/** Last-seen event type per user (transition-pair state); `last` is
  * the per-key event-time high-water mark for the late-event guard. */
case class TransitionState(lastType: String, last: Long)

/** Last known purchase value per user (gap-fill state); -1 = none
  * yet. `last` is the event-time high-water mark. */
case class GapFillState(value: Double, hasValue: Boolean, last: Long)

/** Per-vessel zone-presence state: the set of polygon zones the
  * vessel is currently inside, plus the event-time high-water mark. */
case class ZoneEntryState(inside: Map[String, Boolean], last: Long)

/** Emitted zone entry (a rising inside-edge). */
case class ZoneEntryOut(user_id: Long, zone: String,
    ts: java.sql.Timestamp)

/** Emitted gap-filled event. */
case class GapFillOut(user_id: Long, event_id: Long, event_type: String,
    last_purchase_value: java.lang.Double)

/** Emitted transition pair. */
case class TransitionOut(user_id: Long, from_type: String, to_type: String)

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

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(m: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(m / 1000000L * 1000L)
    t.setNanos((m % 1000000L).toInt * 1000)
    t
  }

  /** File-source entry: stream the events table from a directory of
    * parquet files. The schema is pinned from a RAW batch read (the
    * PHYSICAL schema — pinning the post-conversion timestamp schema
    * would mis-read a bigint-nanos file), then the same per-vintage ts
    * normalization as `Tables.events` is applied on the stream: bigint
    * nanos → `timestamp_micros(ts div 1000)`, TIMESTAMP_NTZ →
    * session-TZ cast, TimestampType → passthrough. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    // Session-lifetime conf flip, documented at Tables.ensureNanosAsLong.
    graft.Tables.ensureNanosAsLong(spark)
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.assertSchema("events", rawSchema)
    // The file source monitors a DIRECTORY; pathGlobFilter pins it to
    // the events table within the shared scale-factor dir.
    val raw = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
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

  /** Sessionization with EXPLICIT custom state via
    * flatMapGroupsWithState — the escape hatch for session semantics
    * `session_window` can't express (e.g. value-dependent gaps, session
    * caps). Per-key state is one open session; closed sessions emit as
    * soon as the gap that closes them is seen. The final open session
    * per user stays in state (would emit on timeout in production —
    * see the scaladoc note).
    *
    * LATE EVENTS: a cross-micro-batch straggler (event time before
    * the key's stored `last`) is DROPPED, the same policy the
    * engine's watermark applies to late rows before stateful ops.
    * Without the guard a stale report would extend the open session
    * and drag `last` backwards, silently diverging from the batch
    * collapse. Within a micro-batch, sorting handles disorder;
    * stream == batch parity therefore requires only that batches
    * arrive per-key non-overlapping in event time (StreamingSpec
    * proves parity on ordered splits and pins the drop on a
    * crafted straggler).
    *
    * At scale: state size is O(active keys), not O(events); keys
    * shard across shuffle partitions.
    */
  def statefulSessions(events: Dataset[EventRow]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = 1800L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[SessionState]) =>
          // micro-batch input is unordered: sort this batch's events
          val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var open = state.getOption
          val out = Seq.newBuilder[SessionOut]
          evs.foreach { e =>
            val t = micros(e.ts)
            open match {
              case Some(s) if t < s.last => () // late straggler: drop
              case Some(s) if t - s.last <= gapMicros =>
                open = Some(s.copy(last = t, n = s.n + 1,
                  sum = s.sum + e.value))
              case Some(s) =>
                out += SessionOut(uid, s.n, toTs(s.start), toTs(s.last),
                  math.round(s.sum * 100).toDouble / 100)
                open = Some(SessionState(t, t, 1, e.value))
              case None =>
                open = Some(SessionState(t, t, 1, e.value))
            }
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** The derived-position 30° zone — graft.operators.GeoOps's
    * withPos ∘ gridCell in plain Scala (event_id is non-negative, so
    * Scala % == SQL %; the floor/division sequence is the same IEEE
    * arithmetic both engines run). */
  private def zoneOf(eventId: Long): String = {
    val lat = (eventId * 7919 % 18000) / 100.0 - 90.0
    val lon = (eventId * 104729 % 36000) / 100.0 - 180.0
    s"${math.floor(lat / 30.0).toLong}:${math.floor(lon / 30.0).toLong}"
  }

  /** Streaming twin of geo_od_matrix's per-voyage collapse: voyages
    * close and emit their (origin zone, destination zone, points) the
    * moment the >30-min report gap that ends them arrives — the
    * live shipping-lanes feed (the OD matrix is a downstream
    * aggregation of this stream). Same state discipline as
    * [[statefulSessions]]: one open voyage per vessel, O(active keys)
    * state, the final open voyage stays in state when input ends —
    * and the same LATE-EVENT guard: a straggler behind the vessel's
    * stored `last` is dropped (it would otherwise overwrite d_zone
    * with a stale position and extend the voyage). */
  def statefulVoyages(events: Dataset[EventRow]): Dataset[VoyageOut] = {
    import events.sparkSession.implicits._
    val gapMicros = 1800L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[VoyageState, VoyageOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[VoyageState]) =>
          val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var open = state.getOption
          val out = Seq.newBuilder[VoyageOut]
          evs.foreach { e =>
            val t = micros(e.ts)
            val z = zoneOf(e.event_id)
            open match {
              case Some(v) if t < v.last => () // late straggler: drop
              case Some(v) if t - v.last <= gapMicros =>
                open = Some(v.copy(last = t, dZone = z, n = v.n + 1))
              case Some(v) =>
                out += VoyageOut(uid, v.oZone, v.dZone, v.n)
                open = Some(VoyageState(z, t, z, 1))
              case None =>
                open = Some(VoyageState(z, t, z, 1))
            }
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming twin of events_markov's pair stream: each event emits
    * the (previous type → this type) transition for its user the
    * moment it arrives; the batch transition MATRIX is the tiny
    * (from, to) aggregation of this stream. State per key is ONE
    * string plus the event-time high-water mark — and the same
    * LATE-EVENT guard as [[statefulSessions]]: a straggler behind
    * the stored mark is dropped rather than emitting a transition
    * pair out of sequence. The live form of sequence mining (a
    * downstream windowed agg gives per-hour transition matrices for
    * drift detection). */
  def statefulTransitions(events: Dataset[EventRow]): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransitionState, TransitionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow],
            state: GroupState[TransitionState]) =>
          val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[TransitionOut]
          evs.foreach { e =>
            val t = micros(e.ts)
            if (!last.exists(t < _.last)) { // late straggler: drop
              last.foreach(l => out += TransitionOut(uid, l.lastType,
                e.event_type))
              last = Some(TransitionState(e.event_type, t))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming twin of window_gap_fill (last-observation-carried-
    * forward): every event emits the user's last KNOWN purchase value
    * the moment it arrives — the live sensor-repair feed. State per
    * key is one double + the high-water mark; same late-straggler
    * drop as [[statefulSessions]] (a stale report must not roll the
    * carried value backwards). StreamingSpec proves the emitted
    * stream equals the batch LOCF window across split micro-batches. */
  def statefulGapFill(events: Dataset[EventRow]): Dataset[GapFillOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapFillState, GapFillOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[GapFillState]) =>
          val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(GapFillState(0.0, false, -1L))
          val out = Seq.newBuilder[GapFillOut]
          evs.foreach { e =>
            val t = micros(e.ts)
            if (t >= s.last) { // late straggler: drop
              if (e.event_type == "purchase")
                s = GapFillState(e.value, hasValue = true, t)
              else s = s.copy(last = t)
              out += GapFillOut(uid, e.event_id, e.event_type,
                if (s.hasValue) Double.box(s.value) else null)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming twin of geo_zone_entries (port-call counting): a
    * vessel's report emits a (zone, entry) record the moment it
    * crosses INTO a polygon zone — the live berth/port-arrival feed.
    * Per-key state is the vessel's current inside-set (|zones|
    * booleans) + the event-time high-water mark, with the same
    * late-straggler drop as the other custom-state ops. The ray cast
    * is GeoOps.insideOf — the plain-Scala twin of the native RayCast
    * expression, so stream == batch parity (StreamingSpec, split
    * micro-batches) transitively proves all three formulations
    * agree. An absent zone key counts as outside, so a vessel's
    * first inside report IS an entry — the batch lag-null semantics. */
  def statefulZoneEntries(events: Dataset[EventRow]): Dataset[ZoneEntryOut] = {
    import events.sparkSession.implicits._
    val zones = graft.operators.GeoOps.zonePolygons
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ZoneEntryState, ZoneEntryOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow],
            state: GroupState[ZoneEntryState]) =>
          val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(
            ZoneEntryState(Map.empty, Long.MinValue))
          val out = Seq.newBuilder[ZoneEntryOut]
          evs.foreach { e =>
            val t = micros(e.ts)
            if (t >= s.last) { // late straggler: drop
              val py = e.event_id * 7919 % 18000 - 9000
              val px = e.event_id * 104729 % 36000 - 18000
              val now = zones.map { case (z, verts) =>
                z -> graft.operators.GeoOps.insideOf(verts, px, py)
              }.toMap
              now.foreach { case (z, in) =>
                if (in && !s.inside.getOrElse(z, false))
                  out += ZoneEntryOut(uid, z, e.ts)
              }
              s = ZoneEntryState(now, t)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming twin of events_funnel: per-user funnel PROGRESSION
    * with explicit state — a completion record emits the moment a
    * user's earliest qualifying event for a stage is seen (stage k
    * must strictly follow the user's stage-(k−1) time, the batch
    * query's semantics). State per key is three epoch-micros longs,
    * O(active users) total. Greedy in-order processing equals the
    * batch min-based formulation when the feed is ts-ordered (same
    * caveat as [[dedup]]); an out-of-order view behind the watermark
    * could lower t1 in batch but not here — production would pair
    * this with a watermark-delayed source sort. */
  def statefulFunnel(events: Dataset[EventRow]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[FunnelState]) =>
          val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = Seq.newBuilder[FunnelOut]
          evs.foreach { e =>
            val t = micros(e.ts)
            if (e.event_type == "view" && s.t1 < 0) {
              s = s.copy(t1 = t)
              out += FunnelOut(uid, "1_view", toTs(t))
            } else if (e.event_type == "click"
                && s.t1 >= 0 && s.t2 < 0 && t > s.t1) {
              s = s.copy(t2 = t)
              out += FunnelOut(uid, "2_click", toTs(t))
            } else if (e.event_type == "purchase"
                && s.t2 >= 0 && s.t3 < 0 && t > s.t2) {
              s = s.copy(t3 = t)
              out += FunnelOut(uid, "3_purchase", toTs(t))
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Stream-stream interval self-join (streaming twin of
    * join_theta_range): each click paired with the same user's views
    * in the following 30 min. Both sides carry watermarks AND the join
    * condition bounds event time on both ends, so the engine can
    * evict join state — the required shape for unbounded
    * stream-stream joins (state is O(events within the interval +
    * watermark), not O(stream)). Works identically on a batch frame
    * (watermarks are a no-op there), which is what the parity test
    * exploits. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "1 hour")
    clicks.join(views,
        col("c_user") === col("v_user")
          && col("v_ts") > col("c_ts")
          && col("v_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"),
        col("c_id"), col("v_id"), col("c_ts"), col("v_ts"))
  }

  /** Idempotent streaming sink: every micro-batch is MERGEd into the
    * parquet target by key via [[graft.sources.IO.upsertParquet]].
    * Because the upsert is idempotent per batch, a replayed
    * micro-batch (at-least-once delivery after a restart) converges
    * to the same target state — exactly-once BY IDEMPOTENCE, the
    * standard pattern when the sink has no transaction log. */
  def upsertSink(df: DataFrame, targetPath: String, keyCols: Seq[String],
      versionCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.IO.upsertParquet(batch.sparkSession, targetPath,
          batch, keyCols, versionCol)
      }

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
