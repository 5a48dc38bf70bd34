package org.apache.spark

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`, but
  * listener-based job-count assertions need a deterministic drain of the
  * async event bus rather than a sleep-poll (the r17 flake surface —
  * `Thread.sleep` quiet-windows can both under-wait on a loaded host and
  * over-wait everywhere else). `waitUntilEmpty()` blocks until every
  * queued event is delivered (10 s cap, then TimeoutException — a loud
  * failure instead of a silently wrong count). */
object GraftListenerBusSync {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
