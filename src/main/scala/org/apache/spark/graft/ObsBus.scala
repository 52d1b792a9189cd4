/*
 * Spark listener-bus face of graft's operator observability events.
 *
 * Lives under org.apache.spark (the same published technique Spark
 * ecosystem libraries use for custom listener events) because
 * SparkContext.listenerBus is private[spark]: posting an event is the
 * one operation the public API exposes only to code inside the spark
 * package tree, while CONSUMING events is fully public
 * (SparkContext.addSparkListener + SparkListener.onOtherEvent are
 * @DeveloperApi). Everything graft-semantic stays in graft.Obs; this
 * file is only the thin post/drain shim.
 */
package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.SparkListenerEvent

/** One graft operator decision as a listener-bus event: the `width`
  * exchange sizings, `pq-exact` expansion counts, `cc` convergence
  * rounds (see [[graft.Obs]] for the catalog). A cluster deployment
  * captures these with a standard listener — no driver-log scraping:
  *
  * {{{
  * spark.sparkContext.addSparkListener(new SparkListener {
  *   override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
  *     case g: GraftObsEvent => metrics.record(g.tag, g.kv)
  *     case _ =>
  *   }
  * })
  * }}}
  *
  * `logEvent` is false: these are live telemetry, not history — the
  * event-log JSON writer serializes unknown event classes through
  * Jackson, and keeping graft events out of it means a graft upgrade
  * can never break an event-log replay.
  */
case class GraftObsEvent(tag: String, kv: Map[String, String])
    extends SparkListenerEvent {
  override protected[spark] def logEvent: Boolean = false
}

object ObsBus {

  /** Post one event to the ACTIVE SparkContext's listener bus, if one
    * exists (no-op otherwise — Obs events can fire from bare unit tests
    * with no Spark running). Driver-side, asynchronous: `post` enqueues
    * and returns; listeners run on the bus threads. */
  def postActive(tag: String, kv: Seq[(String, Any)]): Unit =
    SparkContext.getActive.foreach { sc =>
      sc.listenerBus.post(
        GraftObsEvent(tag,
          kv.map { case (k, v) => k -> String.valueOf(v) }.toMap))
    }

  /** Block until the listener bus has delivered everything posted so
    * far (test/harness hook — the bus is asynchronous, so an assertion
    * immediately after the triggering action races delivery). */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
