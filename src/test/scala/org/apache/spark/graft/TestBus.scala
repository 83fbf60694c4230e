package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the `private[spark]` listener bus: lets
  * specs deterministically drain queued listener events instead of
  * sleeping (a sleep is both flaky under load and wastefully long
  * when idle). Lives under `org.apache.spark` for package-private
  * visibility — test classpath only, never shipped with the library.
  */
object TestBus {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
