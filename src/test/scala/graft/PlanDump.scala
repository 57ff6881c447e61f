package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scratch diagnostic: dump a query's formatted physical plan.
  * With a second arg "exec", runs the query first so the printed
  * plan is the FINAL adaptive plan (shows AQE stage reuse). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.spark
    val df = SparkEntry.queries(args(0))(s, SparkSpec.sf001)
    if (args.length > 1 && args(1) == "exec") df.collect()
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    s.stop()
  }
}
