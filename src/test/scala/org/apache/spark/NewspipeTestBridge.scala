package org.apache.spark

/** Test-only bridge into `private[spark]` internals (same access pattern as
  * `org.apache.spark.sql.NewspipeSqlBridge` on the SQL side).
  */
object NewspipeTestBridge {

  /** Block until the listener bus has delivered every queued event —
    * replaces sleep-based waits in specs that count listener events (a
    * sleep fails OPEN under load: events delivered late are never counted
    * and the assertion passes spuriously).
    */
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
