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

  test("q105: the domain cap bounds rows below the exchange (WindowGroupLimit)") {
    val p = physical("q105_source_cap")
    val partial = p.indexOf("WindowGroupLimit")
    val exch = p.indexOf("Exchange hashpartitioning(source")
    assert(partial >= 0 && exch >= 0,
      s"expected WindowGroupLimit + source exchange:\n$p")
    assert(p.lastIndexOf("WindowGroupLimit") > exch,
      s"expected a partial WindowGroupLimit below the exchange — the cap " +
        s"must not ship whole domains into single tasks:\n$p")
  }

  test("q114: the reservoir cut is TakeOrderedAndProject (no full sort)") {
    val p = physical("q114_weighted_reservoir")
    assert(p.contains("TakeOrderedAndProject"),
      s"A-Res must cut via per-partition heaps:\n$p")
  }

  test("q109: hard-negative label filter sits below the distance/window cut") {
    val p = physical("q109_hard_negatives")
    val partial = p.indexOf("WindowGroupLimit")
    val exch = p.indexOf("Exchange hashpartitioning(qid")
    assert(partial >= 0 && exch >= 0 && p.lastIndexOf("WindowGroupLimit") > exch,
      s"expected a partial WindowGroupLimit below the qid exchange:\n$p")
  }

  test("q19: AQE broadcasts the unhinted df-cap anti-join at fixture scale") {
    // The hot-list and set-size joins carry NO broadcast hint (a forced
    // broadcast of per-document tables fails outright at corpus scale) —
    // this pins that AQE still promotes them to broadcast joins from their
    // RUNTIME size when they are in fact small. The final adaptive plan is
    // only available after execution.
    val df = SparkEntry.queries("q19_ngram_jaccard")(spark, sf)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"AQE should pick a broadcast anti-join for the tiny hot list:\n$p")
  }

  test("jaccard: the no-hint plan works as a pure shuffle join (100 TB path)") {
    // With broadcasting disabled entirely, the same operator must still
    // produce the same rows through shuffle joins — the regime it runs in
    // when the per-document side tables genuinely don't fit an executor.
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap here at all"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val expected = operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val conf = spark.conf
    // getOption-based save/restore: the AQE threshold is usually UNSET
    // (falls back to the static one) — restoring a made-up default would
    // permanently change the shared session for later tests.
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    def restore(key: String, v: Option[String]): Unit =
      v.fold(conf.unset(key))(conf.set(key, _))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = operators.Dedup
        .ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"broadcasting disabled, yet plan still broadcasts:\n$p")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected && got.nonEmpty)
    } finally {
      restore("spark.sql.autoBroadcastJoinThreshold", saved)
      restore("spark.sql.adaptive.autoBroadcastJoinThreshold", savedAqe)
    }
  }

  test("jaccard: one shingle exchange serves distinct + both self-join sides") {
    // Exchange-sharing guard (the r2->r3 q19 fix): the explicit
    // repartition(shingle) is the ONLY shingle-keyed exchange — the
    // distinct aggregate and both probe sides of the self-join reuse its
    // partitioning through the persisted relation. A re-added repartition
    // or persist-splitting refactor shows up as a second shingle exchange.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    val docs = Tables.load(spark, sf, "documents")
    val df = operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
    df.count()
    // Walk the EXECUTED tree (descending into adaptive plans and cached
    // relations, skipping ReusedExchange): only explicit corpus-side
    // repartitions (REPARTITION_BY_COL) count — planner-inserted
    // exchanges on aggregate-sized sides are not the shuffle this guards.
    // A removed persist or re-added repartition shows up as a second
    // distinct instance.
    val seen = scala.collection.mutable.Set.empty[Int]
    val found = scala.collection.mutable.Set.empty[ShuffleExchangeExec]
    def walk(p: SparkPlan): Unit = {
      if (!seen.add(System.identityHashCode(p))) return
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan) // leaf node wrapping a stage
        case im: InMemoryTableScanExec => walk(im.relation.cachedPlan)
        case _: ReusedExchangeExec => ()
        case e: ShuffleExchangeExec =>
          if (e.shuffleOrigin.toString == "REPARTITION_BY_COL" &&
              e.outputPartitioning.toString.contains("shingle"))
            found += e
          e.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(found.size == 1,
      s"expected exactly 1 explicit shingle exchange, found ${found.size}:\n" +
        df.queryExecution.executedPlan.toString)
    df.unpersist()
  }

  test("q45: the multi-assign expansion is persisted and reused by both sides") {
    val p = physical("q45_neardup_ivf")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"both self-join sides must read the cached expansion:\n$p")
  }

  test("q51/q52: clustered near-dup is a blocked equi-join, never a cross join") {
    // The full-table clustered queries must stay in the blocked-join
    // shape: candidates from the list_id equi-join over the persisted
    // expansion — a refactor that degrades to a cartesian/BNLJ product
    // would still return correct rows (slower), so the PLAN is pinned.
    for (q <- Seq("q51_neardup_ivf_clustered", "q52_neardup_cosine_clustered")) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan an unblocked product:\n$p")
      assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
        s"$q: both self-join sides must read the cached expansion:\n$p")
    }
  }

  test("q123: topPaths bounds per-user rows below the exchange " +
    "(WindowGroupLimit)") {
    val p = physical("q123_paths")
    val exch = p.indexOf("Exchange hashpartitioning(user_id")
    assert(p.indexOf("WindowGroupLimit") >= 0 && exch >= 0,
      s"expected WindowGroupLimit + user_id exchange:\n$p")
    assert(p.lastIndexOf("WindowGroupLimit") > exch,
      s"expected a partial WindowGroupLimit below the exchange — mappers " +
        s"must forward at most pathLen rows per user:\n$p")
  }

  test("q124: DSIR per-bucket model table broadcasts; the corpus " +
    "never plans a product") {
    val p = physical("q124_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"the nBuckets-sized log-ratio table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unblocked product in the scoring path:\n$p")
  }

  test("q127: adaptive cell-membership conjunct guards the distance " +
    "predicate (mixed-level INSET)") {
    val p = physical("q127_adaptive_range")
    assert(p.contains("INSET") || p.contains("IN ("),
      s"adaptive cell-membership conjunct missing:\n$p")
    assert(p.contains("graft_sqdist"), p)
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
