package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Visibility shim (same pattern as `org.apache.spark.sql.graft.bridge`):
  * `SparkContext.listenerBus` is `private[spark]`, but a metrics audit that
  * reads listener-accumulated counters right after an action MUST drain the
  * asynchronous bus first or it races the last stage-completed events.
  * Compiling this one call into the spark package namespace beats a sleep. */
object Listeners {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
