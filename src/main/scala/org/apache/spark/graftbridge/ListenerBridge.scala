package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Measurement seam for [[graft.BenchExtra]]'s per-query job/stage/task
  * attribution: `SparkContext.listenerBus` is `private[spark]`, so the
  * deterministic drain (`waitUntilEmpty`) is exposed through this
  * forwarder in an org.apache.spark subpackage — the same visibility
  * technique as [[org.apache.spark.sql.graftbridge.ColumnBridge]].
  * Replaces a fixed Thread.sleep, which could attribute a query's last
  * stage-completed events to the NEXT query under listener-bus backlog.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
