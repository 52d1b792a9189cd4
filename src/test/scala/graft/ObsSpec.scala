package graft

import org.scalatest.funsuite.AnyFunSuite

/** The observability channel's contract (r12 ADVICE: stdout was a
  * load-bearing API; stat-only Spark actions ran unconditionally on the
  * serving path). */
class ObsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("statsWanted is false by default — the serving path pays zero " +
       "stat-only actions") {
    spark.conf.unset("spark.graft.obs")
    assert(!Obs.statsWanted(spark))
  }

  test("statsWanted flips on under an active capture, and via the " +
       "session conf") {
    val (inside, _) = Obs.withCapture(Obs.statsWanted(spark))
    assert(inside)
    assert(!Obs.statsWanted(spark)) // restored after the capture
    spark.conf.set("spark.graft.obs", "true")
    try assert(Obs.statsWanted(spark))
    finally spark.conf.unset("spark.graft.obs")
  }

  test("withCapture returns events in firing order and nests " +
       "(inner capture hides the outer, outer resumes after)") {
    val (_, outer) = Obs.withCapture {
      Obs.event("a", "k" -> 1)
      val (_, inner) = Obs.withCapture(Obs.event("b", "k" -> 2))
      assert(inner == Seq(("b", Seq("k" -> 2))))
      Obs.event("c", "k" -> 3)
    }
    assert(outer == Seq(("a", Seq("k" -> 1)), ("c", Seq("k" -> 3))))
  }

  test("events fired with no capture installed are dropped silently " +
       "(logger-only path)") {
    Obs.event("orphan", "k" -> 0) // must not throw
    val (_, evs) = Obs.withCapture(())
    assert(evs.isEmpty)
  }

  test("events surface through the Spark listener bus — a cluster " +
       "captures operator decisions without scraping driver logs") {
    import org.apache.spark.graft.{GraftObsEvent, ObsBus}
    import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[GraftObsEvent]()
    val listener = new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case g: GraftObsEvent => seen.add(g)
        case _ =>
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // Direct-fire contract: every Obs.event reaches the bus.
      Obs.event("bus-probe", "k" -> 7, "s" -> "x")
      // Operator path: connectedComponents fires a [cc] event per
      // round — the real decision stream a deployment would meter.
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
      operators.Dedup.connectedComponents(edges, "src", "dst").count()
      ObsBus.drain(spark.sparkContext)
      val evs = seen.toArray(Array.empty[GraftObsEvent]).toSeq
      val probe = evs.filter(_.tag == "bus-probe")
      assert(probe.nonEmpty)
      // kv values arrive stringified (the bus event is a plain
      // Map[String, String] so any listener can consume it untyped)
      assert(probe.head.kv == Map("k" -> "7", "s" -> "x"))
      assert(evs.exists(e => e.tag == "cc" && e.kv.contains("round")))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
