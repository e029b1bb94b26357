package org.apache.spark

/** Bridge into the `private[spark]` listener bus so metric snapshots can
  * DRAIN queued task-end events before being read (the bus is async: the
  * last wave of a phase's `onTaskEnd` events may still be in flight when
  * the phase's wall-clock timer stops — reading counters without a drain
  * undercounts CPU time and mis-attributes it to the next phase).
  * Package-placed like [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftSparkBridge {
  /** Block until all queued listener events are dispatched. Best-effort: a
    * bus still busy after the timeout logs a warning and falls back to the
    * undrained counters (losing a tail of task-end events must never abort
    * a bench run whose measured work already completed —
    * `waitUntilEmpty` THROWS TimeoutException on a backlog).
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(s"[graft] listener bus not drained after $timeoutMs ms — counters may undercount")
    }
}
