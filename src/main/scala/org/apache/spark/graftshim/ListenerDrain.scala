package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Task-end events post ASYNC on the listener bus, so a task-time
  * accumulator read right after a query returns can miss the tail of its
  * own tasks (and misattribute them to the next query). `waitUntilEmpty`
  * is `private[spark]`; this shim re-exports it for the bench harness's
  * per-query task-time (ideal32) attribution. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
