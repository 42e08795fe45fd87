package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to the private[spark] listener bus — lets profiling tools
  * drain pending listener events deterministically instead of sleeping
  * (r15 ADVICE on ProfStages: a fixed Thread.sleep can drop stages or
  * attribute them to the wrong run).
  */
object ListenerBridge {
  /** Block until every event posted so far has been delivered to every
    * registered listener (bounded by `timeoutMillis`). */
  def waitUntilListenersProcessed(sc: SparkContext,
      timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
