package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the `private[spark]` listener bus:
  * `QueryExecutionListener`s ride the shared async bus, so plan-capture
  * tests must drain it deterministically instead of polling for
  * quiescence (a lagging bus makes a fixed-interval poll declare "quiet"
  * before the plans arrive, and the no-Window assertions pass vacuously).
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
