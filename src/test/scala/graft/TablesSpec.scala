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

  test("all ten tables load under the schema assertion on real testdata") {
    Tables.names.foreach { n =>
      assert(Tables.table(spark, sf0001, n).count() > 0, s"table $n")
    }
  }
}
