package org.apache.spark.graft

import org.apache.spark.SparkContext

/** The listener bus delivers events asynchronously; a metrics snapshot
  * taken right after an action can miss trailing task-end events.
  * `listenerBus.waitUntilEmpty` is `private[spark]`, so this one-line
  * accessor lives in the org.apache.spark namespace (same pattern as the
  * catalyst expression helpers under org.apache.spark.sql.graft). */
object ListenerBusFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
