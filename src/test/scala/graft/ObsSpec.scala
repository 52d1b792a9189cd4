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
}
