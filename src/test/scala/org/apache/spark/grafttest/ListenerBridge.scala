package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only access to the private[spark] listener bus so job-count
  * assertions (e.g. VectorIndex.load runs ZERO Spark jobs) are exact
  * rather than racy — the bus is async, so a count read without a
  * flush could miss late events and false-pass. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
