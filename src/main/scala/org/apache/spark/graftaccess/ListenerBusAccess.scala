package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** Bridge to the private[spark] listener bus: counters must drain the async
  * bus before reading a snapshot (same need the reference serves with its
  * synchronous umbilical heartbeat counters).
  */
object ListenerBusAccess {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
