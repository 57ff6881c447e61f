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
