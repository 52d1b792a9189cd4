package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guard: the properties that make these queries
  * scale are asserted on the PLAN, not just the result — pushdown reaching
  * the scan, column pruning, top-k without full sort, partial aggregation,
  * and no index-side shuffle for searches. A refactor that silently loses
  * one of these still returns correct rows; this spec is what fails. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def sf = SparkTestSession.sf0001

  private def physical(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q1: filter pushed to parquet, scan reads only needed columns") {
    val p = physical("q1_filter")
    assert(p.contains("PushedFilters") &&
      p.contains("LessThanOrEqual(p_size,10)"), p)
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_size"),
      s"scan must not read unused part columns:\n$p")
  }

  test("q13: global sort+limit plans as TakeOrderedAndProject (no full sort)") {
    val p = physical("q13_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q2: single-query kNN never shuffles the collection") {
    val p = physical("q2_knn")
    assert(!p.contains("Exchange hashpartitioning"),
      s"index side must not shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q7: aggregation is partial+final (map-side combine)") {
    val p = physical("q7_agg")
    val first = p.indexOf("HashAggregate")
    val exch = p.indexOf("Exchange hashpartitioning")
    val last = p.lastIndexOf("HashAggregate")
    assert(first >= 0 && exch > 0 && last > first &&
      first < exch && exch < last,
      s"expected partial agg below the exchange:\n$p")
  }

  test("q4: WindowGroupLimit bounds candidates below the exchange") {
    val p = physical("q4_knn_batch")
    val partial = p.indexOf("WindowGroupLimit")
    val exch = p.indexOf("Exchange hashpartitioning(qid")
    assert(partial >= 0 && exch >= 0,
      s"expected WindowGroupLimit + qid exchange:\n$p")
    assert(p.lastIndexOf("WindowGroupLimit") > exch,
      s"expected a partial WindowGroupLimit below the exchange:\n$p")
  }

  test("q19: hot-shingle df cap is a broadcast anti-join, never a shuffle") {
    val p = physical("q19_ngram_jaccard")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"df-cap filter must broadcast the tiny hot-key list:\n$p")
  }

  test("q45: the multi-assign expansion is persisted and reused by both sides") {
    val p = physical("q45_neardup_ivf")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"both self-join sides must read the cached expansion:\n$p")
  }

  test("q25: the cell-membership conjunct guards the distance predicate") {
    // q25 computes cell_id inline (index fit + assign in one query), so
    // pruning here is predicate-level (the IN/INSET short-circuits the
    // sqdist evaluation); the I/O-level pushdown on a MATERIALIZED index
    // is asserted in IndexAwareRulesSpec ("In(cell_id" in PushedFilters).
    val p = physical("q25_range_pruned")
    assert(p.contains("INSET") || p.contains("IN ("),
      s"cell-membership conjunct missing:\n$p")
    assert(p.contains("graft_sqdist"), p)
  }
}
