package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Bridges the private[spark] listener bus for tests that assert on task
  * metrics (e.g. shuffle bytes): without draining the bus, the last
  * stage's metrics race the assertion.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
