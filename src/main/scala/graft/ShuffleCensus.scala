package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Diagnostic: shuffle write bytes/records for every declared query
  * at the bench SF — the census behind ShuffleVolumeSpec's pins and
  * the round-14 map-side-distinct fixes (text_contamination 5.7 MB →
  * narrow, text_postings token-volume exchange removed). Run it
  * after changing any plan to see whether an exchange appeared or
  * grew; the output is sorted by bytes so the top is the work list.
  *
  * Attribution is sleep-drained (listener delivery is async and the
  * test-only bus accessor isn't visible here); a diagnostic tool can
  * afford 300 ms per query, a spec cannot — the spec uses
  * GraftTestBus.waitUntilEmpty instead.
  */
object ShuffleCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineConf.tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new AtomicLong(0)
    val records = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
        ()
      }
    })
    Tables.names.foreach(n =>
      try { Tables.table(spark, sfDir, n).count() }
      catch { case _: Throwable => () })
    val rows = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      Cache.clear(spark)
      Thread.sleep(300)
      bytes.set(0); records.set(0)
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      Thread.sleep(300)
      (name, if (ok) bytes.get else -1L, records.get)
    }
    println(f"${"query"}%-28s ${"shuffleB"}%12s ${"records"}%10s")
    rows.sortBy(-_._2).foreach { case (n, b, r) =>
      println(f"$n%-28s $b%12d $r%10d")
    }
    val total = rows.map(t => math.max(t._2, 0L)).sum
    println(f"TOTAL shuffle bytes: $total%d across ${rows.size}%d queries")
    spark.stop()
  }
}
