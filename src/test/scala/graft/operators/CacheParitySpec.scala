package graft.operators

import graft.{Cache, RowNorm, SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Cache-boundary result parity over the whole query surface (r16).
  *
  * The engine leans on [[graft.Cache]] for shared midpoints (scored
  * pair sets, LSH postings, IVF rankings, co-presence pairs), so a
  * whole class of bugs lives exactly at that boundary: a key that
  * under-determines its content (two params, one key), an entry that
  * outlives a fixture change, a consumer reading a sibling query's
  * midpoint with different implicit assumptions. CacheSpec pins the
  * LIFETIME contract; nothing before this spec pinned that a
  * cache-HIT execution returns the same rows as a cache-MISS one.
  *
  * Per query (sorted, sf0.001): run once against whatever caches the
  * previous queries left populated (the long-session hit path), then
  * `Cache.clear` and run again (every midpoint rebuilt from source),
  * and assert the two results identical at the oracle bar
  * ([[graft.RowNorm]], 9 significant digits). Because the suite runs
  * sorted and leaves each rebuild in place, later queries' first run
  * hits midpoints built by SIBLING queries — the cross-query
  * staleness shape — while their second run rebuilds alone.
  *
  * The negative control proves the harness actually crosses the
  * boundary: a deliberately poisoned `sim.vecs` entry (half the
  * vectors) must change similarity_knn's hit-path result.
  */
class CacheParitySpec extends SparkSpec {

  private def norm = RowNorm.norm _

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, SparkSpec.sf0001)
      .collect().map(norm).toSeq

  test("negative control: a poisoned cache entry changes the hit path") {
    Cache.clear(spark)
    val honest = run("similarity_knn")
    Cache.clear(spark)
    // Poison: seed sim.vecs (the key Similarity.vecs builds) with
    // half the collection. A hit-path run must now disagree — if it
    // didn't, the queries would not actually be reading the cache
    // and every green test below would be vacuous.
    val poisoned = Cache.cached(spark, SparkSpec.sf0001, "sim.vecs") {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      graft.Tables.embeddings(spark, SparkSpec.sf0001)
        .filter(col("vec_id") % 2 === 0)
        .withColumn("nsq",
          graft.functions.GraftFunctions.vecDot(
            col("embedding"), col("embedding")))
    }
    poisoned.count()
    val viaPoisoned = run("similarity_knn")
    Cache.clear(spark)
    assert(viaPoisoned != honest,
      "poisoned sim.vecs did not change the result — queries are not " +
        "reading the cache, the parity tests below are vacuous")
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name: cache-hit == cache-miss") {
      val hit = run(name)   // whatever midpoints earlier tests left
      Cache.clear(spark)
      val miss = run(name)  // full rebuild from source
      assert(hit.size == miss.size,
        s"row count differs across the cache boundary: " +
          s"hit ${hit.size} vs miss ${miss.size}")
      hit.zip(miss).zipWithIndex.collect {
        case ((h, m), i) if h != m => (i, h, m)
      }.take(3) match {
        case Seq() => ()
        case bad => fail(s"rows differ across the cache boundary: " +
          bad.map { case (i, h, m) => s"row $i: hit=$h miss=$m" }
            .mkString("; "))
      }
    }
  }
}
