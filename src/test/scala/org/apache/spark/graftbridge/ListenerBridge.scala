package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus internals:
  * QueryExecutionListener events are delivered asynchronously, so a test
  * that captures executed plans (the bounded-window inventory) must drain
  * the bus before asserting — polling with sleeps is the flaky
  * alternative.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
