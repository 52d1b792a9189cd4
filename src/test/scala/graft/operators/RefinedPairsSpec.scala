package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.VectorFunctions.sqDist

/** The recursive lossless refinement of saturated IVF lists
  * (Dedup.pairsFromListsRefined): parity with brute force when lists
  * saturate, multi-level recursion parity, and the no-op guarantee at
  * fixture occupancy. */
class RefinedPairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic 4-dim corpus: `nDense` points on a LINE through
    * (10,10,10,10) with 0.1 spacing — each point near-dups with its ~7
    * neighbours per side (linear true output, so the refinement's
    * sub-blocks genuinely separate), any list cap under nDense
    * saturates — plus two sparse 20-point shells far away and, when
    * `clique` > 0, a tight duplicate clique (diameter ≪ threshold) that
    * exercises the no-shrink progress guard. */
  private def skewed(nDense: Int, clique: Int = 0) = {
    val dense = (0 until nDense).map { i =>
      (i.toLong, Array(10.0 + i * 0.1, 10.0 + (i % 3) * 0.01,
        10.0, 10.0).toSeq)
    }
    val sparse = (0 until 40).map { i =>
      val c = if (i % 2 == 0) -20.0 else 40.0
      (100000L + i, Array(c + i * 1.0, c, c - i * 1.0, c).toSeq)
    }
    val dup = (0 until clique).map { i =>
      (200000L + i, Array(-50.0 + i * 1e-4, -50.0, -50.0, -50.0).toSeq)
    }
    (dense ++ sparse ++ dup).toDF("vec_id", "embedding")
  }

  private def brute(df: org.apache.spark.sql.DataFrame,
                    maxSq: Double): Set[(Long, Long, Double)] = {
    val l = df.select(col("vec_id").as("a"), col("embedding").as("__va"))
    val r = df.select(col("vec_id").as("b"), col("embedding").as("__vb"))
    l.join(r, col("a") < col("b"))
      .withColumn("dist", round(sqDist(col("__va"), col("__vb")), 6))
      .filter(col("dist") <= maxSq)
      .select("a", "b", "dist").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
  }

  test("saturated list (600 rows > forced 256 cap): refined == brute force") {
    val df = skewed(600, clique = 300)
    val cents = IvfIndex.fitCentroids(df, "embedding", "vec_id", nlist = 3)
    val got = Dedup.embeddingNearDupByIvf(df, "vec_id", "embedding",
        cents, maxSqDist = 0.5, maxListRows = 256L,
        minRefineCandidates = 0L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val want = brute(df, 0.5)
    assert(want.nonEmpty, "fixture must plant real pairs")
    assert(got == want)
  }

  test("fixture-occupancy lists stay on the UNREFINED plan (default cap): " +
       "no Union arm, result == brute force") {
    // the r11 q51/q52 regression pin: a clustered corpus whose lists
    // hold a few hundred rows must take the base join untouched — one
    // refinement level there costs seconds and separates nothing (its
    // cliques are genuine). Structural check: the refined path's plan is
    // a cold∪hot Union; the short-circuit returns the plain join.
    val df = skewed(600, clique = 300)
    val cents = IvfIndex.fitCentroids(df, "embedding", "vec_id", nlist = 3)
    val out = Dedup.embeddingNearDupByIvf(df, "vec_id", "embedding",
      cents, maxSqDist = 0.5) // default work gate: ~0.4M candidates is cold
    assert(!out.queryExecution.analyzed.toString.contains("Union"),
      "default-cap fixture-scale plan must not contain the refinement arm")
    val got = out.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got == brute(df, 0.5))
  }

  test("progress guard is GEOMETRIC: a barely-shrinking clique recurses at " +
       "most one level (plan nests at most one refinement Union)") {
    // 300 identical-to-1e-4 vectors: every row lands in every sub-list,
    // occupancy cannot halve, so depth-3 must not build 3 nested
    // refinement arms (the ×subk-per-level row blowup of the r11
    // regression). One paid level is the accepted probe cost.
    val df = skewed(0, clique = 300)
    val cents = IvfIndex.fitCentroids(df, "embedding", "vec_id", nlist = 2)
    val out = Dedup.embeddingNearDupByIvf(df, "vec_id", "embedding",
      cents, maxSqDist = 0.5, maxListRows = 64L,
      minRefineCandidates = 0L)
    // one refinement level plans exactly THREE Union nodes: the final
    // cold∪hot, plus the cold-rows assembly union RESTATED by both
    // sides of the base self-join. A second recursion level would add
    // its own three under the hot arm.
    val unions = out.queryExecution.analyzed.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
    assert(unions.size <= 3,
      s"dense clique recursed past one refinement level (${unions.size} Unions)")
    val got = out.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got == brute(df, 0.5) && got.nonEmpty)
  }

  test("multi-level recursion (cap 8, subk 4, depth 3) == base join") {
    val df = skewed(200)
    val cents = IvfIndex.fitCentroids(df, "embedding", "vec_id", nlist = 2)
    val slack = 2.0 * math.sqrt(0.5 + 1e-6)
    val expanded = IvfIndex.assignMultiHomed(
      df.select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding")), "embedding", cents, slack).persist()
    def run(depth: Int) = Dedup.pairsFromListsRefined(expanded,
        "vec_id", "embedding", "embedding", "dist",
        (a, b) => sqDist(a, b), _ <= 0.5, slack,
        maxListRows = 8L, minRefineCandidates = 0L,
        subTarget = 4, subKMax = 4, depth = depth)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val deep = run(3)
    val base = run(0)
    assert(base == brute(df, 0.5))
    assert(deep == base)
    expanded.unpersist()
  }

  test("recursion threads the caller's knobs (named-arg pin): depth=1 " +
       "builds exactly one refinement level, depth=2 nests a second") {
    // Pre-r12 the recursive call was positional across an inserted
    // parameter: subTarget widened into minRefineCandidates, subKMax
    // slid into subTarget, depth-1 into subKMax, and depth reset to its
    // default — so `depth` never decremented and inner levels ran with
    // scrambled gates. Lossless refinement made that invisible to
    // result equality; the plan shape is where it shows. One refinement
    // level plans exactly 3 Unions (final cold∪hot + the cold-rows
    // assembly restated by both base-join sides); each further level
    // adds its own 3 under the hot arm.
    val df = skewed(200)
    val cents = IvfIndex.fitCentroids(df, "embedding", "vec_id", nlist = 2)
    val slack = 2.0 * math.sqrt(0.5 + 1e-6)
    val expanded = IvfIndex.assignMultiHomed(
      df.select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding")), "embedding", cents, slack).persist()
    def unions(depth: Int) = {
      val out = Dedup.pairsFromListsRefined(expanded,
        "vec_id", "embedding", "embedding", "dist",
        (a, b) => sqDist(a, b), _ <= 0.5, slack,
        maxListRows = 8L, minRefineCandidates = 0L,
        subTarget = 4, subKMax = 4, depth = depth)
      (out.queryExecution.analyzed.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
      }.size,
        out.collect().map(x =>
          (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet)
    }
    val (u1, got1) = unions(1)
    val (u2, got2) = unions(2)
    assert(u1 == 3,
      s"depth=1 must stop after ONE refinement level ($u1 Unions)")
    assert(u2 > u1,
      s"depth=2 must nest a second level on this fixture ($u2 vs $u1)")
    val want = brute(df, 0.5)
    assert(got1 == want && got2 == want)
    expanded.unpersist()
  }

  test("occupancy-sized exchange: the base join repartitions by list_id " +
       "at the estimate-derived width; default estimate leaves the plan " +
       "unsized") {
    // The r11 ×100 finding: the candidate join inherited the session's
    // scan-sized initial width and AQE can only coalesce DOWN, so the
    // per-task candidate block spilled. The fix sizes the join's own
    // exchange from the occupancy stats (Σ home·occ). Pinned both ways:
    // a 1-row/partition estimate must produce the 1024-capped explicit
    // width on BOTH join sides, and the default estimate on this tiny
    // fixture must produce NO explicit list_id repartition (oracle
    // plans unchanged).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    def listIdRepartitions(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
      df.count()
      val seen = scala.collection.mutable.Set.empty[Int]
      val found = scala.collection.mutable.ArrayBuffer.empty[Int]
      def walk(p: SparkPlan): Unit = {
        if (!seen.add(System.identityHashCode(p))) return
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case im: InMemoryTableScanExec => walk(im.relation.cachedPlan)
          case _: ReusedExchangeExec => ()
          case e: ShuffleExchangeExec =>
            if (e.shuffleOrigin.toString.startsWith("REPARTITION_BY") &&
                e.outputPartitioning.toString.contains("list_id"))
              found += e.outputPartitioning.numPartitions
            e.children.foreach(walk)
          case other => other.children.foreach(walk)
        }
        p.subqueries.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      found.toSeq
    }
    val df = skewed(200)
    val cents = IvfIndex.fitCentroids(df, "embedding", "vec_id", nlist = 2)
    val slack = 2.0 * math.sqrt(0.5 + 1e-6)
    val expanded = IvfIndex.assignMultiHomed(
      df.select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding")), "embedding", cents, slack).persist()
    def run(rowsPerPart: Long) = Dedup.pairsFromListsRefined(expanded,
      "vec_id", "embedding", "embedding", "dist",
      (a, b) => sqDist(a, b), _ <= 0.5, slack,
      candRowsPerPartition = rowsPerPart)
    // ~80k candidates on this fixture: at 1 row/partition the width is
    // the 1024 cap; both the home side and the probe side carry it.
    val sizedOut = run(1L)
    val widths = listIdRepartitions(sizedOut)
    assert(widths == Seq(1024, 1024),
      s"expected both join sides repartitioned at the 1024 cap: $widths")
    // default estimate: ~80k candidates / 65536 = 2 <= session width →
    // no explicit repartition; plan shape is the pre-r12 one.
    val unsizedOut = run(65536L)
    assert(listIdRepartitions(unsizedOut).isEmpty,
      "small estimates must leave the session plan untouched")
    val got = sizedOut.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got == brute(df, 0.5) && got.nonEmpty)
    assert(unsizedOut.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet == got)
    expanded.unpersist()
  }

  test("cosine variant at saturation == its own unrefined answer") {
    val df = skewed(400)
    val got = Dedup.embeddingNearDupCosine(df, "vec_id", "embedding",
        nlist = 2, minCosine = 0.999)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    // brute cosine
    val l = df.select(col("vec_id").as("a"), col("embedding").as("__va"))
    val r = df.select(col("vec_id").as("b"), col("embedding").as("__vb"))
    val want = l.join(r, col("a") < col("b"))
      .withColumn("cosine", round(
        graft.functions.VectorFunctions.cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= 0.999)
      .select("a", "b", "cosine").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture must plant real cosine pairs")
    assert(got == want)
  }
}
