package graft

/** Spill-aware sizing rules for running the engine at scale — the
  * arithmetic behind "would this hold at 100 TB?" (SURVEY.md §4).
  *
  * The knobs that matter and why:
  *  - `spark.sql.shuffle.partitions`: post-shuffle partitions should
  *    hold ~128-256 MB each so sorts/joins stay in memory. AQE
  *    coalesces down at runtime, so err high: size for the LARGEST
  *    shuffle in the job, not the average.
  *  - `spark.sql.files.maxPartitionBytes`: scan-side split size;
  *    128 MB default is right for parquet row-group granularity.
  *  - `spark.sql.adaptive.*`: AQE re-plans at runtime (partition
  *    coalescing, skew-join splitting) — always on in Spark 4.
  *
  * Worked example: a 100 TB shuffle at 256 MB target → ~400k
  * partitions; on 1000 executors × 8 cores that is ~50 waves, each
  * task spill-free. The same job with the 200-partition default would
  * put 500 GB in each task — guaranteed spill-to-death.
  */
object EngineConf {

  val TargetShufflePartitionBytes: Long = 256L << 20
  val MaxScanPartitionBytes: Long = 128L << 20

  /** Engine session defaults beyond master/partitions — apply to
    * every entry point's builder (Bench, Verify, tests, tools) so
    * measurements and correctness artifacts certify ONE config.
    *
    * canChangeCachedPlanOutputPartitioning=true (Spark default:
    * false): lets AQE coalesce the FINAL stage of a plan that gets
    * `.persist()`-ed, so a cached intermediate's partition count
    * tracks its measured bytes (64 MB advisory target) instead of
    * freezing at spark.sql.shuffle.partitions. The engine leans on
    * [[graft.Cache]] for shared midpoints (co-presence pairs, LSH
    * postings, IVF rankings, scored half-pairs); with the default
    * OFF, a 325 KB edge cache kept 32 near-empty partitions, and
    * every downstream exchange over it paid 32 tasks × ~100 ms
    * fixed cost, ×4 references, per execution — measured r16 on
    * geo_triangles: 26 task-seconds → 0.5, warm wall −40%. Spark
    * defaults it off only to preserve user-visible output
    * partitioning of cached DataFrames (e.g. a user's
    * repartition(n).cache() contract); no graft consumer reads a
    * cached frame's partitioning as an API promise, and
    * ShapeInvarianceSpec certifies result invariance across
    * partition layouts. At 100 TB the same rule yields MORE
    * partitions (bytes/64 MB), so this is adaptive sizing, not a
    * toy-scale hack. */
  def tuned(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    b.config(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      // Decouple shuffle WIDTH from spark.sql.shuffle.partitions:
      // AQE starts every coalescible shuffle at initialPartitionNum
      // and merges down — with parallelismFirst (default true) small
      // shuffles still end at ~defaultParallelism, so toy-scale
      // plans are unchanged, while a large shuffle keeps up to 256
      // properly-sized reduce partitions instead of freezing at the
      // session's 32. Measured r16 at the 1000x relational point
      // (600M-row lineitem): the two shuffle-heaviest joins spilled
      // at 32 fixed partitions (~19M rows/task) and recovered ~45%
      // warm with more partitions; this conf is that fix as a
      // default, not an env override someone has to know about.
      // At 100 TB the initial count should be sized by
      // shufflePartitionsFor — 256 here is the single-box ceiling
      // (32 cores × ~8 waves), env-overridable.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "256"))

  private val rowCountMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Table cardinality from parquet footer metadata — the stat a
    * planner sizes indexes with (LSH bucket fan-out, IVF cell count).
    * A footer read is O(files) driver-side metadata, NOT a Spark job:
    * replacing the previous `df.count()` here removes one full
    * scan-job per ANN query. Memoized per path (immutable testdata;
    * a real catalog would invalidate on commit). */
  def parquetRowCount(spark: org.apache.spark.sql.SparkSession,
      path: String): Long =
    rowCountMemo.getOrElseUpdate(path, {
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
        else Seq(p)
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally r.close()
      }.sum
    })

  /** Post-shuffle partition count for an expected shuffle volume,
    * floored at the parallelism so small jobs still use all cores. */
  def shufflePartitionsFor(shuffleBytes: Long, parallelism: Int): Int =
    math.max(parallelism,
      math.ceil(shuffleBytes.toDouble / TargetShufflePartitionBytes).toInt)

  /** Session confs for a target input scale. */
  def confsFor(shuffleBytes: Long, parallelism: Int): Map[String, String] =
    Map(
      "spark.sql.shuffle.partitions" ->
        shufflePartitionsFor(shuffleBytes, parallelism).toString,
      "spark.sql.files.maxPartitionBytes" -> MaxScanPartitionBytes.toString,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.session.timeZone" -> "UTC")
}
