package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Diagnostic: per-STAGE attribution for one query's warm run —
  * stage name (call site), task count, summed executor run time,
  * shuffle read/write, records. StageCensus says WHICH query burns
  * task time; this says WHERE inside it. Cold run first (builds
  * shared caches), then the measured warm run.
  *
  * Usage: runMain graft.ProfileOne <query> [reps]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ann_ivf")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
          System.getProperty("java.io.tmpdir", "/tmp")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = ArrayBuffer.empty[(String, Int, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val scopes = si.rddInfos.sortBy(_.id).flatMap(_.scope)
          .map(_.name).distinct.mkString(">")
        if (m != null) rows.synchronized {
          rows += ((scopes, si.numTasks,
            m.executorRunTime,
            m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten))
        }
        ()
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val tm = te.taskMetrics
        if (tm != null && tm.executorRunTime > 80)
          println(f"    [task] stage ${te.stageId}%3d run " +
            f"${tm.executorRunTime}%5d ms deser ${tm.executorDeserializeTime}%4d " +
            f"gc ${tm.jvmGCTime}%4d cpu ${tm.executorCpuTime / 1000000}%5d " +
            f"shWr ${tm.shuffleWriteMetrics.writeTime / 1000000}%5d " +
            f"fetchWait ${tm.shuffleReadMetrics.fetchWaitTime}%5d " +
            f"resSer ${tm.resultSerializationTime}%4d")
        ()
      }
    })
    Tables.names.foreach(n =>
      try { Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    SparkEntry.queries(name)(spark, sfDir).count() // cold: cache build
    Thread.sleep(500)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      // the REAL adaptive final plan: count() plans its own tree (agg
      // over the query), so inspecting the query Dataset's
      // executedPlan shows a plan that never ran — the listener sees
      // the executed one, post-AQE
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(f: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              ns: Long): Unit =
            println(s"== executed plan ($f) ==\n" +
              qe.executedPlan.toString.take(14000))
          override def onFailure(f: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        })
    // SPARK_GRAFT_RELEASE=<cache prefix>: clear that cache group
    // before each warm rep, modelling Bench's release schedule (a
    // pass2 number includes the group's rebuild — profiling with the
    // cache warm attributes a different query).
    val release = sys.env.get("SPARK_GRAFT_RELEASE")
    (1 to reps).foreach { r =>
      release.foreach(p => Cache.clear(spark, p))
      spark.sparkContext.getRDDStorageInfo.foreach(i =>
        println(s"  [storage] rdd ${i.id} " +
          s"${i.numCachedPartitions}/${i.numPartitions} cached " +
          s"mem ${i.memSize} disk ${i.diskSize}"))
      rows.synchronized(rows.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"== $name warm rep $r: wall $wall%.2f s ==")
      println(f"${"stage"}%-60s ${"tasks"}%5s ${"runMs"}%8s ${"inRec"}%9s " +
        f"${"shRdB"}%10s ${"shWrB"}%10s ${"shWrRec"}%9s")
      rows.synchronized(rows.toSeq).foreach {
        case (n2, t, ms, ir, rb, wb, wr) =>
          println(f"${n2.take(60)}%-60s $t%5d $ms%8d $ir%9d $rb%10d " +
            f"$wb%10d $wr%9d")
      }
    }
    spark.stop()
  }
}
