package graft.operators

import graft.{Cache, RowNorm, SparkEntry, SparkSpec}

/** Concurrent-execution parity (r16): a long-lived engine session
  * serves queries from MANY threads at once (a JDBC-style frontend,
  * a notebook cluster, Bench itself if it ever parallelized), and
  * the engine carries shared mutable state under that concurrency —
  * the [[graft.Cache]] memo, the Tables loader memo, the function-
  * registration latch. This spec runs a cross-family query mix from
  * a thread pool against ONE session, twice (cold caches, then warm
  * — so both the racing-first-build path and the all-hits path are
  * exercised), and asserts every result identical to its sequential
  * run at the oracle bar ([[graft.RowNorm]]).
  *
  * The mix deliberately includes cache-SHARING families (similarity/
  * ann share sim.vecs and the LSH postings, dedup shares the shingle
  * and pair sets, geo shares the co-presence pairs) so concurrent
  * first-callers race on the same memo keys. Write-path queries
  * (sinks, scratch-writing sources, streaming twins) are excluded:
  * upsertParquet documents single-writer semantics, and their
  * scratch dirs are per-process, not per-thread.
  */
class ConcurrencySpec extends SparkSpec {

  private val mix: Seq[String] = Seq(
    "agg_pricing_summary", "agg_cube", "window_rank", "join_5way",
    "join_asof", "events_funnel", "events_retention",
    "geo_co_presence", "geo_triangles", "geo_voyages",
    "dedup_exact", "dedup_minhash", "dedup_near", "similarity_knn",
    "ann_lsh", "ann_ivf", "text_tfidf", "text_langid", "text_quality",
    "topk_per_group", "set_except", "sample_hash_split",
    "filter_complex", "multimodal_features")

  private def norm = RowNorm.norm _

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, SparkSpec.sf0001)
      .collect().map(norm).toSeq

  test("24 queries under an 8-thread pool match their sequential runs") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    Cache.clear(spark)
    val sequential = mix.map(n => n -> run(n)).toMap

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      // Round 1: cold — Cache cleared, so first-builds of the shared
      // midpoints race across threads. Shuffled submission order so
      // the racing pairs differ from the sequential order.
      // Round 2: warm — every midpoint already persisted; the pure
      // concurrent-hit path.
      (1 to 2).foreach { round =>
        if (round == 1) Cache.clear(spark)
        val shuffled = new scala.util.Random(round * 7919)
          .shuffle(mix)
        val fs = shuffled.map(n => Future(n -> run(n)))
        val got = Await.result(Future.sequence(fs), 600.seconds).toMap
        mix.foreach { n =>
          assert(got(n) == sequential(n),
            s"round $round: $n diverged under concurrency " +
              s"(${got(n).size} vs ${sequential(n).size} rows)")
        }
      }
    } finally {
      pool.shutdown()
      Cache.clear(spark)
    }
  }
}
