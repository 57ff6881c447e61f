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

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null)
          maxTaskMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
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

    def run(name: String)(mk: => DataFrame): Unit = {
      var wall = 0.0
      (1 to 2).foreach { _ =>
        val df = mk
        val t0 = System.nanoTime()
        maxTaskMs.set(0)
        df.count()
        wall = (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(800) // drain async QueryExecutionListener delivery
      val skewFired = lastPlan.get.contains("skew=true")
      println(f"$name%-22s warm=$wall%7.2f s  "
        + f"maxTask=${maxTaskMs.get / 1e3}%6.2f s  aqeSkewSplit=$skewFired")
    }

    println(s"SkewStudy on $d (cpus=$cpus, shipped conf)")
    run("graded_salted") {
      gradedAgg(Skew.saltedJoin(li, sup, "l_suppkey", "l_orderkey", 8))
    }
    run("graded_plain") { gradedAgg(li.join(sup, "l_suppkey")) }
    run("hot_plain_aqe") { hotAgg(fact.join(dim, "k")) }
    run("hot_salted") {
      hotAgg(Skew.saltedJoin(fact.drop("l_suppkey"), dim, "k",
        "l_orderkey", 16))
    }
    spark.stop()
  }
}
