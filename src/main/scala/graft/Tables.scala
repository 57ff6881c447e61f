package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named-table loader over a scale-factor directory.
  *
  * Owns the one read-side quirk in the testdata: `events.ts` is
  * parquet `timestamp[ns]`, which Spark 4.x refuses to read by default
  * (`[PARQUET_TYPE_ILLEGAL] INT64 (TIMESTAMP(NANOS,false))`). We set
  * `spark.sql.legacy.parquet.nanosAsLong` (runtime-settable) so the
  * column arrives as bigint nanoseconds, then convert with integer
  * division (`ts div 1000` — NOT double division, which loses
  * precision above 2^53 ns) to microseconds, matching DuckDB's
  * native ns→µs truncation exactly.
  *
  * At 100 TB these would be directory-partitioned datasets; the loader
  * is the single seam where partition filters / bucketing specs would
  * be injected, so query code never hardcodes paths.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  /** Load any named table, applying per-table normalization. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => spark.read.parquet(path(dir, other))
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view so the whole catalog is
    * queryable with plain `spark.sql("SELECT … FROM lineitem")` — the
    * SQL face of the engine (same plans as the DataFrame face). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  /** LOUD SIDE-EFFECT, by design: reading `events` requires the
    * session conf `spark.sql.legacy.parquet.nanosAsLong=true` (Spark
    * 4.x otherwise refuses the file's timestamp[ns] column), and the
    * conf must still be set when the LAZY plan is analyzed/executed —
    * a set-then-restore would race the deferred read. So this flips
    * the calling session's conf ONCE and leaves it on for the
    * session's lifetime. Consequence for callers: after any events
    * read, OTHER parquet sources with ns timestamps in the same
    * session also arrive as bigint nanos instead of erroring — every
    * loader in this engine (only this file) owns its own conversion,
    * so inside the engine the flag is invisible. Scope: per-session
    * runtime conf; other sessions are untouched. */
  def ensureNanosAsLong(spark: SparkSession): Unit = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(k).contains("true"))
      spark.conf.set(k, "true")
  }

  /** events with `ts` converted ns→µs TimestampType (UTC session). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable; driver-owned Verify/Bench sessions are built
    // without it, so the loader must set it on every call path.
    ensureNanosAsLong(spark)
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
