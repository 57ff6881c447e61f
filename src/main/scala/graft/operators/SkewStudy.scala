package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation A/B (SCALING.md): Spark's native AQE skew-join
  * split vs the static [[Skew.saltedJoin]] rewrite, measured on the
  * 1000× relational fixture under the SHIPPED conf. Two experiments:
  *
  * 1. The graded join_skew_salted SHAPE (lineitem ⋈ supplier):
  *    salted vs the plain equi-join the oracle runs. The dim is
  *    broadcastable at every SF, so this adjudicates whether the
  *    static rewrite's dim×salt replication + two-sided shuffle ever
  *    pays for itself when the planner would broadcast.
  * 2. A hot-key BIG-BIG join neither side can broadcast (fact keyed
  *    with ~5% of rows on ONE key; 4M-row derived dim): plain join
  *    under AQE (skewedPartition split) vs saltedJoin. This is the
  *    shape the salting pattern exists for; AQE's split is the
  *    runtime alternative that needs no rewrite.
  *
  * Reports warm wall (2nd run), the MAX single task duration (the
  * straggler a hot partition creates), and whether AQE's skew split
  * actually fired (executed-plan `skew=true` scrape).
  *
  * Usage: runMain graft.operators.SkewStudy [relDir]
  */
object SkewStudy {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_rel1000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive.OptimizeSkewedJoin",
        org.apache.logging.log4j.Level.DEBUG)

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val maxTaskReadB = new java.util.concurrent.atomic.AtomicLong(0)
    val readB = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null)
          maxTaskMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
        if (t.taskMetrics != null) {
          val b = t.taskMetrics.shuffleReadMetrics.totalBytesRead
          maxTaskReadB.getAndUpdate(m => math.max(m, b))
          if (b > 0) readB.add(b)
          ()
        }
        ()
      }
    })
    // The EXECUTED adaptive plan (a later df.queryExecution on a
    // count() frame shows a different, un-executed tree — the
    // ProfileOne r16 lesson), captured per action.
    val lastPlan = new java.util.concurrent.atomic.AtomicReference("")
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = {
          lastPlan.set(qe.executedPlan.toString); ()
        }
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })

    val li = graft.Tables.lineitem(spark, d)
      .select("l_suppkey", "l_orderkey", "l_quantity")
    val sup = graft.Tables.supplier(spark, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))

    // Experiment-2 inputs: hot-key fact (5% of rows on key 0, rest
    // uniform over 4M keys) and a 4M-row dim — ~80 MB, past any
    // broadcast threshold, so the join MUST shuffle both sides.
    val nKeys = 4000000L
    val fact = li.withColumn("k",
      when(pmod(col("l_orderkey"), lit(20)) === 0, lit(0L))
        .otherwise(pmod(hash(col("l_orderkey")).cast("long"), lit(nKeys))))
    val dim = spark.range(nKeys).select(col("id").as("k"),
      (col("id") % 97).as("w"), (col("id") % 11).as("w2"))

    def gradedAgg(j: DataFrame): DataFrame = j
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("s_nationkey")
    def hotAgg(j: DataFrame): DataFrame =
      j.agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"),
        sum("w").as("sw"))

    val only = args.drop(1).headOption.map(_.split(",").toSet)
    // Arm isolation (r17 advice): an arm that tunes the skew confs
    // must not leak them into the NEXT arm — hot_shj ran under
    // hot_aqe_tuned's 32MB/64MB/2.0 leftovers and hot_salted reset
    // only the threshold, so three of five arms measured a mixed
    // regime. Capture the shipped values once, restore before EVERY
    // arm; an arm's own conf.set then applies to that arm alone.
    val skewConfKeys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val shippedConfs = skewConfKeys.map(k => k -> spark.conf.get(k))
    def run(name: String)(mk: => DataFrame): Unit = {
      if (only.exists(!_.contains(name))) return
      shippedConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        var wall = 0.0
        (1 to 2).foreach { _ =>
          val df = mk
          val t0 = System.nanoTime()
          maxTaskMs.set(0); maxTaskReadB.set(0); readB.clear()
          df.count()
          wall = (System.nanoTime() - t0) / 1e9
        }
        Thread.sleep(800) // drain async QueryExecutionListener delivery
        val skewFired = lastPlan.get.contains("skew=true")
        val reads = readB.toArray(Array.empty[java.lang.Long])
          .map(_.longValue).sorted
        val medRd = if (reads.nonEmpty) reads(reads.length / 2) else 0L
        println(f"$name%-22s warm=$wall%7.2f s  "
          + f"maxTask=${maxTaskMs.get / 1e3}%6.2f s  "
          + f"maxTaskShRd=${maxTaskReadB.get / 1e6}%7.1f MB  "
          + f"medTaskShRd=${medRd / 1e6}%6.1f MB  "
          + f"aqeSkewSplit=$skewFired")
        if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
          println(s"== $name executed plan ==\n"
            + lastPlan.get.linesIterator
              .filter(l => l.contains("Join") || l.contains("Exchange")
                || l.contains("AQEShuffleRead"))
              .mkString("\n").take(4000))
      } catch {
        case t: Throwable =>
          println(s"$name FAILED: ${t.getClass.getName}: "
            + Option(t.getMessage).getOrElse("").take(300))
      }
    }

    println(s"SkewStudy on $d (cpus=$cpus, shipped conf)")
    run("graded_salted") {
      gradedAgg(Skew.saltedJoin(li, sup, "l_suppkey", "l_orderkey", 8))
    }
    run("graded_plain") { gradedAgg(li.join(sup, "l_suppkey")) }
    run("hot_plain_aqe") { hotAgg(fact.join(dim, "k")) }
    // Same join under a LOWERED skew byte-threshold: the default
    // 256 MB misses this straggler because 30M narrow rows compress
    // to ~200 MB — the skew is in rows/compute, not bytes. Aligning
    // the threshold with the 64 MB advisory split size lets
    // OptimizeSkewedJoin see what the task clock sees.
    run("hot_aqe_tuned") {
      // The hot block is one constant key — it compresses ~3x better
      // than the uniform partitions, so its BYTE ratio (~4-5x median)
      // hides a 12x task-time straggler from the default factor-5 /
      // 256 MB detector. factor 2 + threshold = advisory makes the
      // byte detector see what the task clock sees.
      // Measured: the 32M-row hot partition READS only 63.7 MB (the
      // constant-key block dictionary/RLE-compresses ~8x), so even a
      // 64 MB threshold misses a 25 s straggler by 0.3 MB. 32 MB +
      // factor 2 makes the byte detector see it; the split target
      // stays the 64 MB advisory.
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "64MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "2.0")
      val df = hotAgg(fact.join(dim, "k"))
      df
    }
    // Sort-free alternative: the straggler's cost is the SMJ SORT of
    // a row-dense (compression-skewed) partition, so a shuffled HASH
    // join (build the 4M-row dim per partition, stream the fact)
    // removes the per-row log-factor entirely — no detector needed.
    run("hot_shj") {
      hotAgg(fact.join(dim.hint("shuffle_hash"), "k"))
    }
    run("hot_salted") { // shipped conf restored by run() itself
      hotAgg(Skew.saltedJoin(fact.drop("l_suppkey"), dim, "k",
        "l_orderkey", 16))
    }
    spark.stop()
  }
}
