package graft

import org.apache.spark.sql.execution.ExplainMode

/** Whole-suite plan audit: count scale anti-patterns across every
  * declared query's formatted plan (backs PLANS.md's claims). */
object AuditAll {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.spark
    var cart = 0; var bnlj = 0; var maxEx = ("", 0)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(s, SparkSpec.sf001).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val nEx = p.linesIterator.count(_.trim.matches("\\(\\d+\\) Exchange"))
      if (nEx > maxEx._2) maxEx = (name, nEx)
      if (p.contains("CartesianProduct")) { cart += 1
        println(s"AUDIT cartesian: $name") }
      if (p.contains("BroadcastNestedLoopJoin"))
        println(s"AUDIT bnlj: $name")
    }
    println(s"AUDIT max-exchanges: ${maxEx._1} = ${maxEx._2}")
    println(s"AUDIT cartesian-total: $cart")
    s.stop()
  }
}
