package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: replay the Bench pass semantics (sorted order, the
  * releaseAfter cache schedule, count() action) over a SUBSET of
  * queries, several passes, with a load probe per pass — so a
  * per-query before/after can be adjudicated by medians on a noisy
  * box instead of one full-suite sample (r19 optimization round; the
  * box's ambient load swings ±40% between full bench runs, and
  * TimeIt keeps caches warm so it cannot reproduce the pass2 shape).
  *
  * Pass 0 is the untimed JVM/codegen warmup (printed but labeled);
  * medians should read passes 1..n. Every pass starts from a full
  * Cache.clear, so each query pays exactly the cache builds the
  * bench's pass2 charges it.
  *
  * Usage: runMain graft.BenchSome <passes> <query> [query ...]
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq.sorted
    require(names.nonEmpty, "usage: BenchSome <passes> <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n =>
      try { Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    val results =
      scala.collection.mutable.Map.empty[String, Vector[Double]]
        .withDefaultValue(Vector.empty)
    (0 to passes).foreach { p =>
      Cache.clear(spark)
      val times = names.map { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        Bench.releaseAfter.get(n)
          .foreach(_.foreach(pre => Cache.clear(spark, pre)))
        if (p > 0) results(n) = results(n) :+ t
        n -> t
      }
      val pr0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id % 7)").collect()
      val probe = (System.nanoTime() - pr0) / 1e9
      val tag = if (p == 0) "warmup" else s"pass$p"
      println(f"$tag%-7s probe=$probe%.3f  " +
        times.map { case (n, t) => f"$n=$t%.3f" }.mkString("  "))
    }
    println("--- medians (passes 1..n) ---")
    names.foreach { n =>
      val ts = results(n).sorted
      println(f"$n%-28s median=${ts(ts.size / 2)}%.3f  " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
