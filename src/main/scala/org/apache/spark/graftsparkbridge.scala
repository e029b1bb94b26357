package org.apache.spark

/** Bridge into the `private[spark]` listener bus so metric snapshots can
  * DRAIN queued task-end events before being read (the bus is async: the
  * last wave of a phase's `onTaskEnd` events may still be in flight when
  * the phase's wall-clock timer stops — reading counters without a drain
  * undercounts CPU time and mis-attributes it to the next phase).
  * Package-placed like [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftSparkBridge {
  /** Block until all queued listener events are dispatched (or timeout). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
