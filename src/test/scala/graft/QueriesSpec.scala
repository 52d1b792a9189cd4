package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke (t1 analog): every declared query runs at sf0.001; registry and
  * oracle maps stay aligned. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, SparkTestSession.sf0001)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
