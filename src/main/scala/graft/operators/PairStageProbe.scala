package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch diagnostic (safe to delete): per-STAGE shuffle/spill census
  * of the minhash pair-graph build — names the exchange that exhausts
  * this box's disk at the 5M-doc decade (r19; the aggregate StageCensus
  * can't see inside one query). Runs the build at a dir that FITS and
  * prints every stage's shuffle read/write, spill, and task time, so
  * the corpus-volume stage is identifiable and its 10x extrapolation
  * checked against the failing scale.
  */
object PairStageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10_doc")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        def gb(x: Long) = f"${x / 1e9}%8.2f"
        rows.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"taskTime=${m.executorRunTime / 1000.0}%8.1fs " +
          s"shufW=${gb(m.shuffleWriteMetrics.bytesWritten)}GB " +
          s"shufR=${gb(m.shuffleReadMetrics.totalBytesRead)}GB " +
          s"memSpill=${gb(m.memoryBytesSpilled)}GB " +
          s"diskSpill=${gb(m.diskBytesSpilled)}GB  " +
          si.name.take(90))
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val n = Dedup.minhashPairsBuild(spark, d).count()
    org.apache.spark.GraftBusAccess.waitUntilEmpty(spark.sparkContext)
    println(s"PAIRS rows=$n dir=$d")
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.sortBy(s => s.drop(6).trim.takeWhile(_.isDigit).toInt)
      .foreach(println)
    spark.stop()
  }
}
