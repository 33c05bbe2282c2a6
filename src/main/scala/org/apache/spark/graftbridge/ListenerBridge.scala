package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; the stage-metrics
  * reporter in [[graft.QueryTime]] needs to drain it so asynchronously
  * posted stage-completed events are all observed before printing a
  * query's report. Same pattern as sql.graftbridge.ColumnBridge. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
