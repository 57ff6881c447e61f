package org.apache.spark

/** Main-scope twin of the test tree's GraftTestBus: diagnostic mains
  * that attribute Spark jobs to a code region (IndexProbe's
  * construction-job count) need to drain listener delivery
  * deterministically rather than sleep-and-hope. Public Spark API at
  * the bytecode level; the Scala access modifier is the only fence.
  * Not used by any query path. */
object GraftBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
