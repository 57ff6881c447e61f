package graft.operators

import graft.{Cache, EngineConf, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: empirical sweep of the shared LSH index parameters.
  *
  * For each (tables, occupancy, annH1) config and each fixture SF it
  * measures, with the EXACT pipelines the declared queries run:
  *  - ann_lsh recall@3 vs the brute-force twin + wall time,
  *  - mean directed candidates per query (the cost driver),
  *  - dedup_embed_ann pair coverage at cos ≥ 0.45 (must be total for
  *    the oracle hash match) and at cos ≥ 0.40 (safety margin),
  * so the constants in [[Similarity]] are measured, not guessed.
  *
  * Usage: runMain graft.operators.LshSweep [sfDir ...]
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (tables, target occupancy, annH1 tables)
    val configs = Seq(
      (12, 64, 12), // round-2 baseline shape
      (16, 16, 16),
      (24, 16, 8),
      (24, 16, 4),
      (24, 16, 0),
      (32, 16, 8),
      (32, 16, 0),
      (48, 8, 0),
      (64, 8, 0))

    dirs.foreach { d =>
      val n = EngineConf.parquetRowCount(spark, s"$d/embeddings.parquet")
      val brute = Similarity.queries("similarity_topk_per_query")(spark, d)
        .filter("rk <= 3").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val exact45 = Similarity.halfPairs(spark, d)
        .filter(col("cos") >= 0.45).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact40 = Similarity.halfPairs(spark, d)
        .filter(col("cos") >= 0.40).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"== $d  n=$n  brute3=${brute.size}" +
        s"  pairs45=${exact45.size}  pairs40=${exact40.size}")

      configs.foreach { case (t, occ, annH1) =>
        val bits = math.min(48, math.max(4,
          (math.log(n.toDouble / occ) / math.log(2)).ceil.toInt))
        val t0 = System.nanoTime()
        val nCand = Similarity
          .lshCandidates(spark, d, t, bits, 42L, annH1).count()
        val tCand = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val ann = Similarity.annTopK(spark, d, t, bits, 42L, annH1)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        val tAnn = (System.nanoTime() - t1) / 1e9
        val recall = (brute & ann).size.toDouble / brute.size
        val cov45 = Dedup.embedAnnPairs(spark, d, t, bits, 42L, t, 0.45)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val cov40 = Dedup.embedAnnPairs(spark, d, t, bits, 42L, t, 0.40)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"T=$t%-3d occ=$occ%-3d bits=$bits%-2d annH1=$annH1%-3d" +
          f" recall=$recall%.3f cand/q=${nCand.toDouble / n}%8.1f" +
          f" miss45=${(exact45 -- cov45).size}%2d" +
          f" miss40=${(exact40 -- cov40).size}%2d" +
          f" tAnn=$tAnn%5.1fs tCand=$tCand%5.1fs")
        Cache.clear(spark, "sim.lsh")
      }
      Cache.clear(spark)
    }
    spark.stop()
  }
}
