package graft.operators

import graft.{Cache, EngineConf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline diagnostic: can ANY probe schedule make `ann_ivf` scan
  * ≤ 30% of the collection at recall@3 ≥ 0.9 on the isotropic
  * fixture? (The r13 verdict's watch item.)
  *
  * Three measurements, each against the exact index the declared
  * query builds ([[Similarity.ivfRanked]]):
  *
  *  1. CEILING CDF — for every ground-truth (query, top-3 member)
  *     pair, the probe rank of the member's cell in the query's
  *     best-first cell order. `P(rank ≤ f·k)` is the recall a
  *     UNIFORM budget f achieves, and no schedule that probes cells
  *     best-first can beat this curve at average fraction f unless
  *     its stop rule can tell WHICH queries may stop early — which
  *     is measurement 2.
  *  2. STOP-SIGNAL AUC — the only per-query state an adaptive rule
  *     can observe after probing m cells is the candidate scores so
  *     far (e.g. the 3rd-best cosine). If cos3@m separates "all
  *     true neighbors already found" from "a better neighbor hides
  *     in an unprobed cell", a threshold rule beats the uniform
  *     budget; if the miss rate is flat across cos3 deciles, the
  *     signal carries nothing and adaptive ≈ uniform.
  *  3. RESIDUAL-BOUND PRUNING POWER — the classic sound rule skips
  *     cell c when cos(θ(q,c) − radius(c)) < cos3-so-far. Reports
  *     the cell-radius distribution and the fraction of (query,
  *     cell) pairs the bound could EVER prune (bound < the query's
  *     true 3rd-best cosine): if ~0, sound pruning is vacuous on
  *     this geometry.
  *
  * Output: one human-readable block per SF dir; paste into PLANS.md
  * as the measured basis of whatever the ann_ivf verdict is.
  *
  * Usage: runMain graft.operators.IvfProbeStudy [sfDir ...]
  */
object IvfProbeStudy {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach(d => study(spark, d))
    spark.stop()
  }

  private def study(spark: SparkSession, d: String): Unit = {
    import spark.implicits._
    val n = EngineConf.parquetRowCount(spark, s"$d/embeddings.parquet")
    val k = Similarity.ivfCells(n)
    println(s"== IvfProbeStudy $d  n=$n  k=$k ==")

    // The declared query's own index: (vec_id, pcell, pcos, prk).
    val ranked = Similarity.ivfRanked(spark, d, k,
      Similarity.IvfLloydIters).persist()
    val assign = ranked.filter(col("prk") === 1)
      .select(col("vec_id").as("v2"), col("pcell"),
        col("pcos").as("member_centroid_cos"))
    val v = Similarity.vecs(spark, d)

    // Ground truth top-3 per query (exact brute force).
    val brute3 = Similarity.queries("similarity_topk_per_query")(spark, d)
      .filter("rk <= 3").select(col("v1"), col("v2"), col("cos"))
      .persist()

    // --- 1. ceiling CDF of true-pair cell ranks --------------------
    val pairRanks = brute3.join(assign.select("v2", "pcell"), "v2")
      .join(ranked.select(col("vec_id").as("v1"), col("pcell"),
        col("prk")), Seq("v1", "pcell"))
      .select(col("v1"), col("v2"), col("prk")).persist()
    val ranksArr = pairRanks.select("prk").as[Int].collect().sorted
    val nPairs = ranksArr.length
    def cdf(f: Double): Double = {
      val m = math.max(2, math.ceil(k * f).toInt) // the nprobe floor
      ranksArr.count(_ <= m).toDouble / math.max(1, nPairs)
    }
    val fs = Seq(0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6, 0.7)
    println("   ceiling recall(f) — P(true-pair cell rank <= f*k):")
    println("   " + fs.map(f => f"f=$f%.2f:${cdf(f)}%.3f").mkString("  "))
    // Clairvoyant per-pair average: the mean fraction a PERFECT stop
    // rule (stops the instant the last true neighbor is found) would
    // scan to cover 90% of pairs — the absolute floor for ANY
    // adaptive scheme, sound or heuristic.
    val q90 = ranksArr(math.min(nPairs - 1, (0.9 * nPairs).toInt))
    val clair = ranksArr.filter(_ <= q90).map(_.toDouble / k)
    println(f"   clairvoyant floor: avg f=${clair.sum / clair.length}%.3f"
      + f" to cover 90%% of pairs (90th pct cell rank $q90 of $k)")

    // --- 2. does cos3-so-far predict misses? -----------------------
    // Candidate scores after probing the first m cells, per query,
    // at several checkpoints — the ONLY state a stop rule can see.
    val checkpoints = Seq(0.10, 0.15, 0.20, 0.25, 0.30)
    val maxM = math.max(2, math.ceil(k * checkpoints.max).toInt)
    val cand = ranked.filter(col("prk") <= maxM)
      .select(col("vec_id").as("v1"), col("pcell"), col("prk"))
      .join(assign.select("v2", "pcell"), "pcell")
      .filter(col("v1") =!= col("v2"))
      .join(v.select(col("vec_id").as("v1"),
        col("embedding").as("ea"), col("nsq").as("na")), "v1")
      .join(v.select(col("vec_id").as("v2"),
        col("embedding").as("eb"), col("nsq").as("nb")), "v2")
      .withColumn("cos", graft.functions.GraftFunctions.vecDot(
        col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .select("v1", "prk", "cos").persist()
    // per query: cos3 after each checkpoint's cell budget
    val cos3By = checkpoints.map { f =>
      val m = math.max(2, math.ceil(k * f).toInt)
      f -> cand.filter(col("prk") <= m).groupBy("v1")
        .agg(expr("sort_array(collect_list(cos), false)[2]").as("cos3"))
        .select(col("v1"), coalesce(col("cos3"), lit(-1.0)).as("cos3"))
        .as[(Long, Double)].collect().toMap
    }.toMap
    // per query: the cell ranks of its true top-3 (missing rank =
    // the pair's cell was somehow unranked — impossible here, but
    // guard with k+1 so it counts as a miss at every budget)
    val ranksByQ = pairRanks.select(col("v1"), col("prk"))
      .as[(Long, Int)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2) }
    val queries = v.select(col("vec_id")).as[Long].collect()
    val mCheck = math.max(2, math.ceil(k * 0.3).toInt)
    val perQ = queries.map { q =>
      val c3 = cos3By(0.30).getOrElse(q, -1.0)
      val miss = ranksByQ.getOrElse(q, Array.empty[Int])
        .count(_ > mCheck).toLong
      (c3, miss)
    }
    val sortedQ = perQ.sortBy(-_._1)
    val dec = math.max(1, sortedQ.length / 10)
    println(s"   stop-signal at m=$mCheck (f=0.30): miss rate by "
      + "cos3-so-far decile (1 = highest cos3):")
    val rates = sortedQ.grouped(dec).zipWithIndex.take(10).map {
      case (g, i) =>
        f"d${i + 1}:${g.map(_._2).sum.toDouble / g.length}%.2f"
    }
    println("   " + rates.mkString("  "))
    val overall = perQ.map(_._2).sum.toDouble / perQ.length
    println(f"   overall misses/query at f=0.30: $overall%.2f"
      + f" (recall ${1 - overall / 3}%.3f)")

    // --- 2b. exhaustive two-phase policy sweep ---------------------
    // The whole natural adaptive family: probe f1·k cells, STOP if
    // cos3-so-far ≥ τ, else continue to f2·k. For every (f1, f2) and
    // every τ on the empirical cos3 grid, compute (avg fraction,
    // recall) from the measured per-query data; report the best
    // recall any policy achieves within avg f ≤ 0.3 and the cheapest
    // policy reaching recall ≥ 0.9. This is a measurement of the
    // POLICY SPACE, not one hand-picked rule.
    val nQ = queries.length
    val nP = math.max(1, nPairs)
    var bestRecallAt03 = ("", 0.0, 0.0)
    var cheapestAt09 = ("", 1.0, 0.0)
    for {
      f1 <- checkpoints
      f2 <- Seq(0.40, 0.50, 0.60, 0.75)
      if f2 > f1
    } {
      val m1 = math.max(2, math.ceil(k * f1).toInt)
      val m2 = math.max(2, math.ceil(k * f2).toInt)
      val c3 = cos3By(f1)
      val taus = c3.values.toSeq.sorted.distinct
      val grid = (0 to 20).map(i =>
        taus(math.min(taus.size - 1, i * (taus.size - 1) / 20)))
      grid.foreach { tau =>
        var found = 0L; var fracSum = 0.0
        queries.foreach { q =>
          val stop = c3.getOrElse(q, -1.0) >= tau
          val m = if (stop) m1 else m2
          fracSum += m.toDouble / k
          found += ranksByQ.getOrElse(q, Array.empty[Int]).count(_ <= m)
        }
        val avgF = fracSum / nQ
        val rec = found.toDouble / nP
        val desc = f"f1=$f1%.2f f2=$f2%.2f tau=$tau%.3f"
        if (avgF <= 0.30 && rec > bestRecallAt03._2)
          bestRecallAt03 = (desc, rec, avgF)
        if (rec >= 0.90 && avgF < cheapestAt09._2)
          cheapestAt09 = (desc, avgF, rec)
      }
    }
    println(f"   policy sweep (two-phase cos3 stop rule, all f1/f2/tau):")
    println(f"     best recall with avg f <= 0.30: ${bestRecallAt03._2}%.3f"
      + f" at ${bestRecallAt03._1} (avg f=${bestRecallAt03._3}%.3f)")
    println(f"     cheapest policy with recall >= 0.90: avg f="
      + f"${cheapestAt09._2}%.3f at ${cheapestAt09._1}"
      + f" (recall=${cheapestAt09._3}%.3f)")
    cand.unpersist()

    // --- 3. residual-bound pruning power ---------------------------
    // radius(c) = max angle from centroid to member; bound for
    // (q, c) = cos(theta(q,c) - radius(c)); prunable iff bound <
    // the query's true 3rd-best cos (the best case for the rule —
    // assumes the true top-3 already in hand).
    val radius = assign
      .withColumn("ang", acos(least(lit(1.0),
        greatest(lit(-1.0), col("member_centroid_cos")))))
      .groupBy("pcell").agg(max(col("ang")).as("radius"))
    val radStats = radius.agg(
      min("radius").as("min"), avg("radius").as("avg"),
      max("radius").as("max")).as[(Double, Double, Double)].first()
    println(f"   cell radius (radians): min=${radStats._1}%.2f"
      + f" avg=${radStats._2}%.2f max=${radStats._3}%.2f"
      + f" (pi/2=${math.Pi / 2}%.2f = no coherence)")
    val true3 = brute3.groupBy("v1")
      .agg(min("cos").as("cos3_true"))
    val prunable = ranked
      .select(col("vec_id").as("v1"), col("pcell"), col("pcos"))
      .join(radius, "pcell").join(true3, "v1")
      .withColumn("theta", acos(least(lit(1.0),
        greatest(lit(-1.0), col("pcos")))))
      .withColumn("bound",
        when(col("theta") <= col("radius"), lit(1.0))
          .otherwise(cos(col("theta") - col("radius"))))
      .agg(sum(when(col("bound") < col("cos3_true"), 1).otherwise(0))
        .as("prunable"), count(lit(1)).as("total"))
      .as[(Long, Long)].first()
    println(f"   residual bound prunes ${prunable._1} of"
      + f" ${prunable._2} (query, cell) pairs ="
      + f" ${prunable._1.toDouble / prunable._2}%.4f of the index"
      + " even WITH the true top-3 in hand")

    pairRanks.unpersist(); brute3.unpersist(); ranked.unpersist()
    Cache.clear(spark)
  }
}
