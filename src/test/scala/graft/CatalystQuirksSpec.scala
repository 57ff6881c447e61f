package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins of UPSTREAM Catalyst behavior our harnesses must route
  * around — not engine bugs, but load-bearing knowledge for anyone
  * extending the distributed-equality probes (ShardProbe-style
  * X == Y checks). Each test pins the CURRENT upstream behavior so
  * that a Spark upgrade that fixes the quirk fails the pin and tells
  * us the workaround can be retired. Narrative + workaround:
  * PLANS.md "Appendix — Catalyst exceptAll over deduped window plans".
  */
class CatalystQuirksSpec extends SparkSpec {

  private def df = spark.range(100).select(col("id"),
    (col("id") % 10).as("g"), (col("id") * 7 % 13).as("x"))
  private def w = Window.partitionBy("g")
    .orderBy(col("x").desc, col("id"))

  test("exceptAll over window-rank -> dropDuplicates(subset) plans " +
      "that KEEP the rank column trips Catalyst's " +
      "INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (Spark 4.1.2; the r18 probe " +
      "failure, minimized: RewriteExceptAll's counting aggregate " +
      "loses the window-derived attribute carried through Deduplicate)") {
    def dd = df.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 3).dropDuplicates("g", "id")
      .select("g", "id", "rk")
    val e = intercept[Throwable] { dd.exceptAll(dd).count() }
    assert(e.toString.contains("ATTRIBUTE_NOT_FOUND"),
      "upstream quirk changed — if exceptAll now works over deduped " +
        "window plans, retire the materialized-dump workaround " +
        s"(PLANS.md appendix). Saw: ${e.toString.take(400)}")
  }

  test("either half of the trigger alone is fine: no dropDuplicates, " +
      "or the rank column dropped before exceptAll") {
    def plain = df.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 3).select("g", "id", "rk")
    assert(plain.exceptAll(plain).count() == 0)
    def ddNoRk = df.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 3).dropDuplicates("g", "id").select("g", "id")
    assert(ddNoRk.exceptAll(ddNoRk).count() == 0)
  }

  test("the standing WORKAROUND: materialize both sides, re-read, " +
      "exceptAll compares clean (what ShardProbe/ShardSpec do)") {
    def dd = df.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 3).dropDuplicates("g", "id")
      .select("g", "id", "rk")
    val scratch = s"/tmp/graft_quirks/p${ProcessHandle.current().pid()}"
    dd.write.mode("overwrite").parquet(s"$scratch/a")
    dd.write.mode("overwrite").parquet(s"$scratch/b")
    val a = spark.read.parquet(s"$scratch/a")
    val b = spark.read.parquet(s"$scratch/b")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
