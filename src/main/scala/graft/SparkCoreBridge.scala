package org.apache.spark

/** Bridge to `private[spark]` core surface: draining the async listener
  * bus so per-query stage-metric snapshots in [[graft.Bench]] are exact
  * (stage-completed events otherwise lag the action by milliseconds and
  * bleed into the next query's delta). Same pattern as GraftSqlBridge —
  * lives in the spark package solely to satisfy the access modifier. */
object GraftCoreBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
