package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randomEvents(seed: Long, n: Int, nKeys: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, rnd.nextInt(nKeys).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(7200) * 1000L))
    }.toDF("id", "k", "ts")
  }

  private def naive(l: org.apache.spark.sql.DataFrame,
                    r: org.apache.spark.sql.DataFrame,
                    lowerSec: Long, upperSec: Long): Set[(Long, Long)] =
    l.as("a").join(r.as("b"),
        col("a.k") === col("b.k") &&
          unix_micros(col("b.ts")) >= unix_micros(col("a.ts")) + lowerSec * 1000000L &&
          unix_micros(col("b.ts")) < unix_micros(col("a.ts")) + upperSec * 1000000L)
      .select(col("a.id"), col("b.id"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet

  private def banded(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame,
                     lowerSec: Long, upperSec: Long,
                     bandSec: Long = 0L): Set[(Long, Long)] =
    RangeJoin.intervalJoin(l, r, "k", "ts", "ts", lowerSec, upperSec, bandSec)
      .select(col("l_id"), col("r_id"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet

  test("banded interval join == naive theta join on random events") {
    val l = randomEvents(1, 300, 5)
    val r = randomEvents(2, 300, 5)
    val want = naive(l, r, 0, 600)
    assert(want.nonEmpty, "fixture must produce matches")
    assert(banded(l, r, 0, 600) === want)
  }

  test("band width only routes candidates — any width gives the same result") {
    val l = randomEvents(3, 200, 4)
    val r = randomEvents(4, 200, 4)
    val want = naive(l, r, 30, 900)
    for (band <- Seq(60L, 870L, 3600L))
      assert(banded(l, r, 30, 900, band) === want, s"band=$band")
  }

  test("negative lower bound (window straddling the anchor)") {
    val l = randomEvents(5, 150, 3)
    val r = randomEvents(6, 150, 3)
    assert(banded(l, r, -300, 300) === naive(l, r, -300, 300))
  }

  test("boundaries: lower inclusive, upper exclusive") {
    import spark.implicits._
    val base = 1700000000000L
    val l = Seq((1L, 1L, new java.sql.Timestamp(base)))
      .toDF("id", "k", "ts")
    val r = Seq(
      (10L, 1L, new java.sql.Timestamp(base)),          // at lower: in
      (11L, 1L, new java.sql.Timestamp(base + 9999)),   // inside
      (12L, 1L, new java.sql.Timestamp(base + 10000)))  // at upper: out
      .toDF("id", "k", "ts")
    assert(banded(l, r, 0, 10) === Set((1L, 10L), (1L, 11L)))
  }

  test("null keys and null timestamps match nothing") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    val l = Seq((1L, Option(1L), Option(ts)), (2L, None, Option(ts)),
      (3L, Option(1L), None)).toDF("id", "k", "ts")
    val r = Seq((10L, Option(1L), Option(ts)), (11L, None, Option(ts)),
      (12L, Option(1L), None)).toDF("id", "k", "ts")
    assert(banded(l, r, 0, 10) === Set((1L, 10L)))
  }

  test("plan is an equi-join on (key, bucket) — no nested-loop/cartesian") {
    val l = randomEvents(7, 100, 3)
    val r = randomEvents(8, 100, 3)
    val plan = RangeJoin.intervalJoin(l, r, "k", "ts", "ts", 0, 600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
