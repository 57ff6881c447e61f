package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (safe to delete): drift-cancelled interleaved
  * A/B for the two r18 quiet movers (r18 verdict next-round #2).
  *
  * 1. dedup_near 0.87 → 1.35 — claimed ATTRIBUTION SHIFT, not a
  *    regression: since dedup.pairs became a disk artifact (r18),
  *    dedup_clusters no longer builds the shingle cache in its pass,
  *    so dedup_near (the next shingle consumer surviving the release
  *    schedule) pays the build it used to inherit. The knob that
  *    reverts the regime exists (-Dgraft.diskidx=off → the r17 shape
  *    where clusters rebuilds in-pass), so the claim is testable:
  *    in the mem arm dedup_near must get its r17 time back while
  *    dedup_clusters pays, and the family total must favor disk.
  * 2. geo_triangles 0.80 → 1.03 — NO geo code changed r17→r18 (git
  *    diff is empty for GeoOps; Bench's ordering/releases unchanged),
  *    so a plan regression is impossible; the arms are identical for
  *    geo and the A/B degenerates to a repeated clean-window band
  *    measurement replaying the bench pass state (geo_co_presence
  *    builds geo.coPairs, then geo_triangles consumes it, as in the
  *    sorted suite order).
  *
  * Each rep replays the bench pass boundary (Cache.clear everything)
  * and interleaves the arms disk→mem within the rep so ambient drift
  * cancels (the DedupEmbedAb discipline).
  */
object MoversAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n =>
      try { graft.Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    // Suite-order replay of the two families under adjudication:
    // dedup_clusters/dedup_minhash precede dedup_near (shingle/pair
    // regime), geo_co_presence precedes geo_triangles (coPairs).
    val queries = Seq("dedup_clusters", "dedup_minhash", "dedup_near",
      "geo_co_presence", "geo_triangles")
    def runSeq(): Seq[(String, Double)] = queries.map { q =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      q -> (System.nanoTime() - t0) / 1e9
    }
    val arms = Seq(
      ("disk", () => { sys.props -= "graft.diskidx"; () }),
      ("mem", () => { sys.props("graft.diskidx") = "off"; () }))
    // cold pass per regime: JIT + the one-time artifact build
    arms.foreach { case (_, set) =>
      set(); graft.Cache.clear(spark); runSeq()
    }
    val acc = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { rep =>
      val line = arms.map { case (name, set) =>
        set()
        graft.Cache.clear(spark) // the pass boundary releases ALL
        val ts = runSeq()
        ts.foreach { case (q, dt) => acc((name, q)) = dt :: acc((name, q)) }
        ts.map { case (q, dt) => f"$q=$dt%.2f" }
          .mkString(s"$name[", " ", "]")
      }.mkString("  ")
      println(s"rep$rep: $line")
    }
    sys.props -= "graft.diskidx"
    arms.foreach { case (name, _) =>
      val fam = queries.take(3)
      queries.foreach { q =>
        val xs = acc((name, q)).sorted
        println(f"$name%-5s $q%-16s min=${xs.head}%.2f " +
          f"median=${xs(xs.size / 2)}%.2f")
      }
      val famTot = fam.map(q => {
        val xs = acc((name, q)).sorted; xs(xs.size / 2)
      }).sum
      println(f"$name%-5s dedup-family median total=$famTot%.2f")
    }
    spark.stop()
  }
}
