package org.apache.spark.graftinternal

import org.apache.spark.SparkContext

/** Narrow bridge into `private[spark]` spark-core surface, sibling of the
  * sql-side `org.apache.spark.sql.graftinternal.Bridge`. One capability:
  * drain the async listener bus, so telemetry read from SparkListener
  * callbacks (Bench's per-query task metrics) reflects every task of the
  * query that just finished instead of dropping late-delivered events or
  * attributing them to the next query. */
object CoreBridge {
  /** Block until every event posted so far has been delivered to every
    * registered listener, or the timeout elapses (returns false then). */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
