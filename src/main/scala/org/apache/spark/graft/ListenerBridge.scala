package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Listener-bus flush bridge for [[graft.Bench]]'s per-query byte
  * accounting: `SparkContext.listenerBus` is `private[spark]`, so the
  * drain hook re-exports from inside the spark package namespace (the
  * Bridge.scala pattern — nothing in Spark is modified). Draining the
  * async bus between queries is what makes task-metric deltas
  * attributable to ONE query instead of bleeding into the next.
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
