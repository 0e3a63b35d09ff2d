package org.apache.spark

/** Bridge into the `private[spark]` core surface. The harness's
  * job-failure attribution (graft.Bench) listens on the async listener
  * bus; events for a failed job can still be queued when the sweep's
  * last query returns, and a snapshot taken then would drop or
  * misattribute them. `LiveListenerBus.waitUntilEmpty` is the exact
  * flush primitive Spark's own test harnesses use, but it is
  * package-private — same shim pattern as GraftSqlBridge. */
object GraftSparkBridge {
  /** Block until every queued listener event has been delivered (or the
    * timeout elapses — a hang in a listener must not hang the bench). */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
