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

  /** Disk-backed [[cached]]: the built frame is ALSO persisted as a
    * bucketed, sorted external parquet table under /tmp, and every
    * later entry — after a [[clear]], or under a fresh SparkContext
    * in this process — READS the artifact instead of re-running the
    * build lineage.
    *
    * This is the index-layer contract a 100-TB deployment actually
    * has: an LSH/IVF index is built once by an indexing job and
    * persisted; query jobs open it. Before r17 the ANN indexes lived
    * only in the session cache, so the bench's release schedule made
    * every timed pass pay the full signature/Lloyd build (measured
    * r16: ann_ivf warm 2.3–2.7 s of which ~2 s was rebuild vs a
    * 0.57 s steady-state query). The artifact turns that rebuild
    * into a bucketed parquet scan.
    *
    * Bucketing is part of the contract, not a convenience: the
    * artifact is CLUSTERED BY the downstream join key (LSH:
    * (tbl, bucket); IVF: pcell), so the index side of the candidate
    * join arrives pre-partitioned and pays NO exchange — and for IVF,
    * where BOTH probe and member sides derive from the same artifact,
    * the probe join needs no shuffle at all.
    *
    * Freshness: a one-line meta file pins the artifact to a
    * fingerprint (file count : bytes : max mtime) of the source
    * parquet it was derived from — a regenerated fixture rebuilds,
    * same-source re-entry reads. The scratch path is per-PID (the
    * round-8 concurrency discipline: parallel sbt test + bench JVMs
    * must not race on overwrite-then-read), so "first build per
    * process, reads thereafter" — within a process, new
    * SparkContexts re-attach to the files via a CREATE TABLE …
    * CLUSTERED BY … LOCATION registration from the stored schema.
    *
    * The returned frame still goes through [[cached]] (persisted
    * MEMORY_AND_DISK): repeated consumers inside one query pass hit
    * memory; a clear() drops memory only and the next entry re-opens
    * the table. */
  def diskBacked(s: SparkSession, dir: String, name: String,
      sourceTable: String, bucketCols: Seq[String], buckets: Int = 32)
      (build: => DataFrame): DataFrame =
    cached(s, dir, name)(
      ensureArtifact(s, dir, name, sourceTable, bucketCols, buckets)(build))

  private val pid = ProcessHandle.current().pid()
  private def san(x: String): String = x.replaceAll("[^A-Za-z0-9]", "_")

  /** Source fingerprint: recursive (count:bytes:maxMtime) of the
    * source parquet dir — a driver-side FS listing, no job. */
  private def fingerprint(s: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) "absent"
    else {
      val it = fs.listFiles(p, true)
      var n = 0L; var bytes = 0L; var mt = 0L
      while (it.hasNext) {
        val f = it.next()
        n += 1; bytes += f.getLen
        mt = math.max(mt, f.getModificationTime)
      }
      s"$n:$bytes:$mt"
    }
  }

  /** Build-if-absent for the on-disk index artifact. Globally
    * synchronized: builds are rare and racing writers (parallel test
    * suites sharing a context) must not interleave an overwrite with
    * a registration. */
  private def ensureArtifact(s: SparkSession, dir: String, name: String,
      sourceTable: String, bucketCols: Seq[String], buckets: Int)
      (build: => DataFrame): DataFrame = synchronized {
    val root = s"/tmp/graft_index/p$pid/${san(dir)}/${san(name)}"
    val table = s"graft_idx_${san(dir)}_${san(name)}"
    val dataPath = s"$root/data"
    val metaPath = java.nio.file.Paths.get(s"$root/meta")
    // "v2:" = artifact LAYOUT version (one file per bucket since the
    // writeBucketed repartition fix) — bumping it invalidates
    // artifacts written under an older layout even when the source
    // fingerprint still matches.
    val fp = "v2:" + fingerprint(s, s"$dir/$sourceTable")
    val meta =
      if (java.nio.file.Files.exists(metaPath))
        Some(new String(java.nio.file.Files.readAllBytes(metaPath),
          java.nio.charset.StandardCharsets.UTF_8))
      else None
    if (meta.exists(_.startsWith(fp + "\n"))) {
      if (!s.catalog.tableExists(table)) {
        // Same process, fresh SparkContext (test suites): re-attach
        // the catalog entry to the existing files. The bucket spec in
        // the DDL matches the writer's, so bucketed reads stay valid.
        val schemaDdl = meta.get.split("\n", 2)(1)
        s.sql(s"CREATE TABLE $table ($schemaDdl) USING PARQUET " +
          s"CLUSTERED BY (${bucketCols.mkString(", ")}) " +
          s"SORTED BY (${bucketCols.mkString(", ")}) " +
          s"INTO $buckets BUCKETS LOCATION '$dataPath'")
      }
      s.table(table)
    } else {
      val df = build
      // Invalidate meta BEFORE the overwrite so a crash mid-write
      // leaves a rebuildable (not a silently stale) artifact.
      java.nio.file.Files.deleteIfExists(metaPath)
      if (s.catalog.tableExists(table)) s.sql(s"DROP TABLE $table")
      graft.sources.IO.writeBucketed(df, table, buckets, bucketCols,
        Some(dataPath))
      java.nio.file.Files.createDirectories(metaPath.getParent)
      java.nio.file.Files.write(metaPath,
        (fp + "\n" + df.schema.toDDL)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s.table(table)
    }
  }
}
