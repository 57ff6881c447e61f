package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (safe to delete): drift-cancelled interleaved
  * A/B for the r17 dedup_embed / dedup_embed_ann quiet creep (r17
  * verdict item 3: embed 0.59 → 0.82/0.94, embed_ann 1.09 → 1.25 in
  * BOTH r17 quiet runs; the named suspect is the artifact-scan path
  * on the all-32-table Hamming-1 dedup probe).
  *
  * Each rep replays the BENCH PASS STATE these queries actually run
  * in — everything released (Bench clears "" at the prior pass's
  * end), then ann_lsh runs first (sorted order), THEN the two dedup
  * queries — under two regimes interleaved in one session:
  *   disk — shipped (sim.lsh opens the on-disk bucketed artifact)
  *   mem  — -Dgraft.diskidx=off (the r16 regime: signature lineage
  *          rebuilt into the memory tier each pass)
  * If the creep is the artifact path, disk > mem ONLY on the dedup
  * pair while ann_lsh moves the other way (it saves the rebuild).
  */
object DedupEmbedAb {
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
    val queries = Seq("ann_lsh", "dedup_embed", "dedup_embed_ann")
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
      queries.foreach { q =>
        val xs = acc((name, q)).sorted
        println(f"$name%-5s $q%-16s min=${xs.head}%.2f " +
          f"median=${xs(xs.size / 2)}%.2f")
      }
    }
    spark.stop()
  }
}
