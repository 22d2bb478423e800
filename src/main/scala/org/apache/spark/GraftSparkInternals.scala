package org.apache.spark

/** Minimal accessor for Spark internals the harness code needs.
  *
  * `SparkContext.listenerBus` is `private[spark]`; the skew/spill gates
  * must DRAIN it before reading task metrics (a fixed `Thread.sleep`
  * races late `onTaskEnd` events on a loaded host — ADVICE r9). This is
  * harness/test plumbing only; no query path depends on it.
  */
object GraftSparkInternals {
  /** Block until all queued listener events are dispatched (bounded). */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
