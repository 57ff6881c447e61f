package org.apache.spark

/** Test-only accessor for the `private[spark]` listener bus: lets
  * specs drain listener delivery deterministically
  * (`waitUntilEmpty`) instead of guessing with fixed sleeps —
  * ConstructionSpec's job attribution was wall-clock-window based
  * and could blame an innocent query for a late-delivered event
  * under host load (round-13 advice). Public Spark API at the
  * bytecode level; the Scala access modifier is the only fence. */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
