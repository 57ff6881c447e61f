package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader contract: the one seam between the driver-regenerated
  * testdata and 157 queries. Two properties are pinned:
  *
  *  1. `events.ts` normalizes to session-TZ TimestampType from EITHER
  *     parquet vintage — bigint nanoseconds (rounds ≤9 data) or
  *     timestamp[us]/TIMESTAMP_NTZ (current data) — and the two
  *     vintages produce IDENTICAL values for the same instant. The
  *     r10/r11 data regeneration broke 59/157 queries because the
  *     loader assumed one vintage; this spec makes that class of
  *     breakage a one-test failure.
  *  2. Schema drift fails LOUDLY at load: a missing column or an
  *     unsupported type names the table, column, and got-vs-supported
  *     types instead of surfacing as N downstream analysis errors.
  */
class TablesSpec extends SparkSpec {
  import SparkSpec.sf0001

  private def tmpdir(): String =
    java.nio.file.Files.createTempDirectory("graft-tables").toString

  test("events.ts: current testdata (timestamp[us]) loads as session-TZ timestamp") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }

  test("events.ts: bigint-nanos vintage loads and matches the NTZ vintage value-for-value") {
    // Rebuild a ns-vintage events file from the current one: the same
    // instants, stored as bigint nanoseconds. The loader must produce
    // identical (event_id, ts) pairs from both encodings.
    val dir = tmpdir()
    Tables.events(spark, sf0001)
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ns = Tables.events(spark, dir)
    assert(ns.schema("ts").dataType == TimestampType)
    val diff = ns.select("event_id", "ts")
      .exceptAll(Tables.events(spark, sf0001).select("event_id", "ts"))
    assert(diff.isEmpty, "ns-vintage decode diverged from NTZ-vintage decode")
  }

  test("events.ts: true parquet TIMESTAMP(NANOS) vintage exercises the" +
      " nanosAsLong path end to end") {
    // The bigint-nanos test above stores ts as a PLAIN int64, which
    // Spark reads as LongType with or without the conf — it pins the
    // LongType dispatch branch but not the conf that makes real ≤r9
    // files readable at all (round-12 advice). This fixture carries
    // the actual TIMESTAMP(NANOS) logical annotation, written with
    // parquet's example API (Spark itself cannot write ns).
    val dir = tmpdir()
    val rows = Seq( // (event_id, ns-instant) incl. a sub-µs remainder
      (1L, 1700000000_000000000L), (2L, 1700000101_123456789L),
      (3L, 1700000202_999999999L))
    writeNanosEvents(s"$dir/events.parquet", rows)
    // The annotation must be REAL: without the legacy conf, Spark
    // refuses the column (the PARQUET_TYPE_ILLEGAL class of error) —
    // proving this fixture, unlike plain int64, goes through the
    // nanosAsLong seam.
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    val had = spark.conf.getOption(k)
    spark.conf.unset(k)
    val refused =
      try intercept[Throwable] {
        spark.read.parquet(s"$dir/events.parquet").schema
      }
      finally had.foreach(spark.conf.set(k, _))
    assert(refused.getMessage.toUpperCase.contains("ILLEGAL")
      || refused.getMessage.contains("NANOS"),
      s"expected an illegal-parquet-type refusal, got: $refused")
    // Through the loader: conf flipped on, ns truncated to µs.
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    // DuckDB-identical truncation: ns div 1000 -> µs (ms here for
    // java.sql.Timestamp.getTime, which floors the same way).
    val exp = rows.map { case (id, ns) => id -> ns / 1000000L }.toMap
    assert(got == exp, s"ns decode mismatch: $got vs $exp")
  }

  /** Write an events.parquet whose ts column is INT64 annotated
    * TIMESTAMP(NANOS, isAdjustedToUTC=false) — the arrow
    * `timestamp[ns]` physical form of the ≤r9 testdata — using the
    * parquet-hadoop example writer on Spark's own classpath. */
  private def writeNanosEvents(file: String,
      rows: Seq[(Long, Long)]): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(false,
        LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType())
      .named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType())
      .named("props")
      .named("events")
    val out = org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      spark.sparkContext.hadoopConfiguration)
    val writer = ExampleParquetWriter.builder(out)
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ns) =>
      val g = gf.newGroup()
      g.add("event_id", id)
      g.add("ts", ns)
      g.add("user_id", id % 7)
      g.add("event_type", "click")
      g.add("value", 1.5)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
  }

  test("schema drift: wrong-typed column fails loud with table.column and types") {
    val dir = tmpdir()
    // events with ts as STRING — not a supported vintage.
    spark.range(3).select(
        col("id").as("event_id"), lit("2024-01-01").as("ts"),
        col("id").as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("Tables.events.ts"))
    assert(e.getMessage.contains("STRING"))
    assert(e.getMessage.contains("supported"))
  }

  test("schema drift: missing column fails loud naming the column") {
    val dir = tmpdir()
    spark.range(3).select(col("id").as("doc_id"), lit("x").as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](
      Tables.documents(spark, dir))
    assert(e.getMessage.contains("Tables.documents.lang"))
    assert(e.getMessage.contains("missing"))
  }

  test("schema drift: additive evolution (extra column) is allowed") {
    val dir = tmpdir()
    spark.read.parquet(s"$sf0001/region.parquet")
      .withColumn("r_comment", lit("new"))
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    assert(Tables.region(spark, dir).count() == 5)
  }

  test("table loads are memoized per (session, dir, name)") {
    // The r13 warm-floor win: spark.read.parquet's schema inference
    // is a 1-task job, so an un-memoized loader charges every query
    // CONSTRUCTION a scheduler roundtrip. Same instance back = no
    // re-read, no job; a different dir still loads (and drift-checks)
    // fresh.
    assert(Tables.lineitem(spark, sf0001) eq Tables.lineitem(spark, sf0001))
    assert(Tables.events(spark, sf0001) eq Tables.events(spark, sf0001))
    assert(!(Tables.lineitem(spark, SparkSpec.sf001)
      eq Tables.lineitem(spark, sf0001)))
  }

  test("table memo invalidates when the fixture is regenerated in place") {
    // Mid-session testdata regeneration is a recurring event in this
    // repo (the r10/r11 vintage flip): the memo keys on the parquet
    // path's mtime (one cheap stat per lookup), so a regenerated
    // fixture re-loads and re-runs the drift check instead of
    // surviving as a stale entry until session restart.
    val dir = tmpdir()
    val p = s"$dir/region.parquet"
    spark.read.parquet(s"$sf0001/region.parquet")
      .write.mode("overwrite").parquet(p)
    val first = Tables.region(spark, dir)
    assert(first.count() == 5)
    spark.read.parquet(s"$sf0001/region.parquet").limit(3)
      .write.mode("overwrite").parquet(p)
    // force a distinct mtime: a fast overwrite can land in the same
    // filesystem timestamp granule
    val f = new java.io.File(p)
    assert(f.setLastModified(f.lastModified() + 2000))
    val second = Tables.region(spark, dir)
    assert(!(second eq first), "stale memo entry survived regeneration")
    assert(second.count() == 3)
  }

  test("all ten tables load under the schema assertion on real testdata") {
    Tables.names.foreach { n =>
      assert(Tables.table(spark, sf0001, n).count() > 0, s"table $n")
    }
  }
}
