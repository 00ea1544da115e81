package org.apache.spark

/** Bridge into SparkContext's private[spark] listener bus for graft's
  * evidence tooling (the GraftSql pattern): PlanDump registers an async
  * QueryExecutionListener and must DRAIN the bus before snapshotting,
  * or construction-time plans of slow queries go silently missing from
  * the evidence files (ADVICE r10 — the fixed Thread.sleep it replaces
  * could under-wait).
  */
object GraftSparkInternals {

  /** Block until the shared listener bus has delivered every queued
    * event, up to `timeoutMs`; returns whether it fully drained. */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Boolean =
    try {
      sc.listenerBus.waitUntilEmpty(timeoutMs)
      true
    } catch {
      case _: java.util.concurrent.TimeoutException => false
    }
}
