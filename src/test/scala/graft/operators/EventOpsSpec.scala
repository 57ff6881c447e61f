package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sessionization invariants + gap-boundary edge semantics
  * (SURVEY.md §5 property list). */
class EventOpsSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("session boundary: gap of exactly 30 min does NOT split") {
    val s = spark
    import s.implicits._
    // u1: gaps 30min (no split), 31min (split). u2: single event.
    val df = Seq(
      (1L, ts(0), 10L, "click", 1.0),
      (2L, ts(30), 10L, "click", 1.0),   // 30:00 gap -> same session
      (3L, ts(61), 10L, "click", 1.0),   // 31:00 gap -> new session
      (4L, ts(0), 20L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    df.createOrReplaceTempView("events_mem")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val sess = df
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull
          || unix_micros(col("ts")) - unix_micros(col("prev_ts"))
             > 1800L * 1000000L, 1).otherwise(0))
      .groupBy("user_id").agg(sum("new_sess").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess(10L) == 2, "30-min gap must not split; 31-min must")
    assert(sess(20L) == 1)
  }

  test("every event lands in exactly one session") {
    val sessions = EventOps.queries("stream_session")(
      spark, SparkSpec.sf0001)
    val eventTotal = graft.Tables.events(spark, SparkSpec.sf0001).count()
    val inSessions = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(inSessions == eventTotal)
  }

  test("session count per user = gap count + 1") {
    val perUser = EventOps.queries("stream_session")(
      spark, SparkSpec.sf0001)
      .groupBy("user_id").count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = graft.Tables.events(spark, SparkSpec.sf0001)
      .withColumn("gap",
        when(unix_micros(col("ts"))
          - unix_micros(lag(col("ts"), 1).over(w))
          > 1800L * 1000000L, 1).otherwise(0))
      .groupBy("user_id").agg(sum("gap").as("gaps"))
    val joined = perUser.join(gaps, "user_id").collect()
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + 1,
        s"user ${r.getLong(0)}: sessions ${r.getLong(1)} != gaps+1")
    }
  }

  test("union_all counts are additive") {
    val sf = SparkSpec.sf0001
    val c = graft.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 0).count()
    val s = graft.Tables.supplier(spark, sf)
      .filter(col("s_acctbal") > 0).count()
    val u = graft.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 0).select(col("c_name").as("name"))
      .unionAll(graft.Tables.supplier(spark, sf)
        .filter(col("s_acctbal") > 0).select(col("s_name").as("name")))
      .count()
    assert(u == c + s)
  }

  test("events_outliers: no |z| sits on the 2σ boundary (margin)") {
    // The declared query's oracle compares engine-computed floats
    // through the 2σ membership filter; a z within ~1e-13 of the
    // threshold could flip between Spark and DuckDB. Pin the minimum
    // boundary distance at both t2 SFs so a fixture change that
    // lands a z on the boundary fails HERE before the oracle flakes.
    // Contingency then: demote events_outliers to no-oracle.
    import org.apache.spark.sql.expressions.Window
    Seq(SparkSpec.sf001, SparkSpec.sf01).foreach { sf =>
      val w = Window.partitionBy("user_id")
      val margin = graft.Tables.events(spark, sf)
        .withColumn("mu", avg("value").over(w))
        .withColumn("sd", stddev_samp(col("value")).over(w))
        .filter(col("sd") > 0)
        .select(abs(abs((col("value") - col("mu")) / col("sd")) - 2.0)
          .as("dist"))
        .agg(min("dist")).head.getDouble(0)
      info(f"min |z|-to-2σ distance at $sf: $margin%.3e")
      assert(margin > 1e-13,
        f"a z-score sits $margin%.3e from the 2σ boundary — " +
          "cross-engine membership is no longer safe")
    }
  }

  test("events_anomaly_mad: exact 3×MAD boundary rows exist and are" +
      " excluded by integer arithmetic") {
    // The 2-dp value lattice makes dev == 3·MAD ties EXACT (a margin
    // pin like the 2σ one is impossible — the margin is legitimately
    // zero), which is why the query compares 2·dev2 > 3·mad2 in
    // integers. Pin both halves: boundary rows exist at sf0.1 (the
    // rewrite is load-bearing), and none of them flags.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id")
    val lattice = graft.Tables.events(spark, SparkSpec.sf01)
      .withColumn("vc2", (round(col("value") * 100) * 2).cast("long"))
      .withColumn("med2",
        expr("percentile(vc2, 0.5)").over(w).cast("long"))
      .withColumn("dev2", abs(col("vc2") - col("med2")))
      .withColumn("mad2",
        expr("percentile(dev2 * 2, 0.5)").over(w).cast("long"))
      .filter(col("mad2") > 0)
    val boundary = lattice
      .filter(col("dev2") * 2 === lit(3) * col("mad2")).count()
    info(s"exact 3×MAD boundary rows at sf0.1: $boundary")
    assert(boundary > 0,
      "no exact-boundary rows — the integer-lattice rationale is stale")
    val flaggedBoundary = EventOps.queries("events_anomaly_mad")(
      spark, SparkSpec.sf01)
      .join(lattice.filter(col("dev2") * 2 === lit(3) * col("mad2"))
        .select("event_id"), "event_id").count()
    assert(flaggedBoundary == 0, "a boundary row leaked into the flags")
  }

  test("events_retention: offset-0 row equals cohort size, offsets bounded") {
    import org.apache.spark.sql.functions._
    val ret = EventOps.queries("events_retention")(spark, SparkSpec.sf001)
      .collect()
    assert(ret.nonEmpty)
    // day 0 = the cohort-defining day: every cohort has it, and its
    // count is the cohort's full population (each user is active on
    // their own first day by definition)
    val cohortSizes = graft.Tables.events(spark, SparkSpec.sf001)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val day0 = ret.filter(_.getInt(1) == 0)
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(day0 == cohortSizes)
    // no negative offsets (an event can't precede its user's first
    // day), and no offset row exceeds its cohort's population
    ret.foreach { r =>
      assert(r.getInt(1) >= 0)
      assert(r.getLong(2) <= cohortSizes(r.getDate(0).toString))
    }
  }
}
