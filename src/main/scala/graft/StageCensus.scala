package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Diagnostic: WARM per-query job/stage census — how many Spark jobs
  * and stages one execution of each query schedules, plus summed task
  * time and shuffle volume. Motivation (r16): graft.Floor measured the
  * per-ACTION scheduler floor at 0.12–0.19 s on this box, but a query
  * is many sequential STAGES; a warm 2.5 s query on 17 MB is almost
  * never 2.5 s of compute — it is stage-count × stage-floor plus
  * whatever the longest task chain holds. This census attributes the
  * warm tail: a query whose wall ≫ task-time is scheduler/barrier
  * bound (fix = fewer exchanges or fewer partitions per tiny stage),
  * one whose task-time ≈ wall × parallelism is compute bound (fix =
  * kernel work). Queries run once cold (cache build), then measured
  * on the second, warm run — the same number Bench's pass2 reports.
  *
  * Usage: runMain graft.StageCensus [query ...] (default: warm tail)
  */
object StageCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.sameElements(Seq("all"))) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq("ann_ivf", "geo_triangles", "dedup_clusters",
        "events_concurrency", "ann_lsh", "geo_co_presence",
        "geo_lanes_top", "dedup_embed_ann", "pipeline_corpus_prep",
        "sink_upsert_merge", "join_theta_range", "similarity_topk_per_query")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val taskMs = new AtomicLong(0)
    val shufB = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        ()
      }
    })
    Tables.names.foreach(n =>
      try { Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    println(f"${"query"}%-26s ${"warm_s"}%7s ${"jobs"}%5s ${"stages"}%7s " +
      f"${"taskSec"}%8s ${"shufB"}%10s")
    names.foreach { name =>
      // cold run builds shared caches; warm run is what Bench reports
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        Thread.sleep(300)
        jobs.set(0); stages.set(0); taskMs.set(0); shufB.set(0)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain async listener delivery
        println(f"$name%-26s $wall%7.2f ${jobs.get}%5d ${stages.get}%7d " +
          f"${taskMs.get / 1e3}%8.2f ${shufB.get}%10d")
      } catch {
        case e: Throwable =>
          println(f"$name%-26s FAILED ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
