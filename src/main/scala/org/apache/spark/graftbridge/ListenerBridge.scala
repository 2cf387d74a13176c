package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Harness shim (same pattern as `sql.graftbridge.ColumnBridge`):
  * `SparkContext.listenerBus` is `private[spark]`, but bench tools that
  * count events via an async `SparkListener` must drain the bus before
  * sampling their counters, or late-delivered events are missed /
  * attributed to the wrong measurement window.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
