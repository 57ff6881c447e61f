package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo of persisted intermediates, with explicit
  * release.
  *
  * Several operators share expensive midpoints — the scored half-pair
  * set feeds both brute-force similarity queries and the exact
  * embedding dedup; the shingle set feeds three dedup variants; the
  * LSH bucket index feeds both ANN search and embedding dedup.
  * Building them once per (session, sf-dir) and persisting turns
  * "3 queries × full recompute" into "1 compute + 2 cache reads",
  * which is exactly what a real engine's materialized-index layer
  * does.
  *
  * MEMORY_AND_DISK: these intermediates are bounded (narrow pair rows,
  * signatures, centroids), but at a larger SF spilling beats OOM.
  *
  * Lifetime: entries live until [[clear]] — there is no magic
  * collection. (A WeakHashMap keyed by session cannot work here: the
  * cached DataFrames strongly reference their session via
  * `Dataset.sparkSession`, so the weak key would always be reachable
  * through its own value.) Callers that run many queries in one
  * session — Bench, long-lived services — must `clear` once a cache
  * group's consumers are done, or persisted blocks accumulate for the
  * session's lifetime. As a safety net, entries whose SparkContext
  * has stopped are dropped on the next `cached` call.
  */
object Cache {
  private val memo = scala.collection.mutable.LinkedHashMap
    .empty[(SparkSession, String, String), DataFrame]

  /** Memoize `build` (persisted) under (session, dir, name). The
    * build is run at most once per key: construction is serialized,
    * so two racing first callers cannot leave an orphaned persisted
    * plan behind. */
  def cached(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = memo.synchronized {
    // Drop entries of stopped sessions — their blocks already died
    // with the SparkContext; this frees the plan graphs (and the
    // session references the key holds) without needing weak refs.
    memo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    memo.getOrElseUpdate((s, dir, name),
      build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Unpersist and forget this session's entries whose name starts
    * with `prefix` (empty prefix = everything). Safe to call at any
    * point — consumers re-build on next use. */
  def clear(s: SparkSession, prefix: String = ""): Unit =
    memo.synchronized {
      val doomed = memo.keys
        .filter(k => (k._1 eq s) && k._3.startsWith(prefix)).toSeq
      doomed.foreach { k =>
        memo.remove(k).foreach(df =>
          try df.unpersist(blocking = false)
          catch { case _: Throwable => () })
      }
    }
}
