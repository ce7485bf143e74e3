package org.apache.spark

/** Test-only shim: `SparkContext.listenerBus` is `private[spark]`, and
  * metric-collecting specs (SkewRobustnessSpec) need a DETERMINISTIC
  * drain of the async listener bus before reading their task profiles —
  * a fixed sleep can drop late TaskEnd events on a loaded box and let a
  * skewed stage slip under the assertion bar unmeasured. */
object GraftTestBridge {
  /** Blocks until every queued listener event is delivered (bounded by
    * the bus's internal ~10 s budget; throws on overrun rather than
    * silently proceeding with a partial profile). */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
