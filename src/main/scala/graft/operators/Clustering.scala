package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.sqDist

/** Distributed clustering over embedding columns. The reference ships no
  * clustering (its tree is a spatial index, not a partitioner —
  * include/pktree.hpp:44); this is declared extension surface: the same
  * Lloyd trainer IvfIndex runs driver-side over a bounded sample
  * (IvfIndex.fitCentroids), re-expressed as a DISTRIBUTED fixed-point so
  * the full corpus participates — the semantic-dedup / corpus-organization
  * primitive (SemDeDup-style cluster-then-prune needs every row assigned,
  * not a sample).
  *
  * Scale design per iteration: assignment is a broadcast-literal argmin
  * expression — k×dim doubles folded into the projection, NO join and NO
  * shuffle; the update is ONE map-side-combined groupBy(cluster) of dim
  * scalar averages (the q72 meanVector shape — never rows×dim explode);
  * the driver sees k×dim doubles per round. Total cost: iters scans +
  * iters k-row shuffles.
  *
  * Determinism across engines and reruns: init is the first k vectors by
  * id; distances AND centroid components round to `roundTo` decimals
  * every iteration, so each round's input is bit-identical in any engine
  * that agrees at that precision (float sum order differs between Spark's
  * partial aggregates and a sequential engine; rounding absorbs the ulps
  * — same contract as q72). Ties in the argmin go to the lowest cluster
  * id via struct ordering on (dist, cid). Empty clusters keep their
  * previous centroid (IvfIndex.lloyd's rule).
  */
object Clustering {

  /** Largest k the literal struct-array argmin formulation serves before
    * kmeans switches to the primitive-loop NearestCentroid expression —
    * see the comment inside [[kmeans]]. */
  val ExprKMax = 16

  /** SSL-prototypes / D4-style outlier pruning over a clustered
    * embedding space: every row gets its squared-L2 distance to its
    * final centroid as a WITHIN-CLUSTER percentile (percent_rank, ties
    * share), and the farthest `dropFrac` fraction is flagged for
    * removal — the "off-manifold" tail of each cluster, where OCR
    * garbage and mislabeled content concentrate. The complement knob of
    * [[graft.operators.Dedup.semanticDedup]]: SemDeDup prunes the
    * densest neighborhoods (redundancy), this prunes the sparsest
    * (noise); D4 runs both.
    *
    * The percentile is the same histogram percent_rank as
    * TextAnalysis.calibrateQuality (distances are rounded to `roundTo`,
    * so the histogram is value-cardinality-sized) — no per-row window,
    * no whole-cluster single-task sort. keep is decided on the ROUNDED
    * percentile, so the boundary is engine-deterministic. */
  /** Greedy k-center coreset selection (Gonzalez' 2-approximation, the
    * farthest-point traversal): start from the smallest id, repeatedly
    * add the point FARTHEST from the chosen set — the standard diverse-
    * subset selector for data curation (active-learning coresets,
    * Sener & Savarese '18): k points that cover the embedding space,
    * where random sampling oversamples dense regions.
    *
    * Determinism contract: distances are rounded to 6 dp BEFORE each
    * argmax and ties break by smallest id, so the selected set is
    * engine-portable (the q13-style ordered-limit discipline, k times).
    *
    * Scale: k driver rounds; each is ONE scan computing the min
    * distance to the ≤ k chosen centers (a literal-array least() fold
    * compiled into the projection — centers are never a join side) and
    * one TakeOrderedAndProject argmax. Driver state is k (id, vector)
    * pairs — bounded by construction. k jobs is the price of the
    * sequential greedy; each round's work is one codegen'd scan.
    *
    * @return (sel_order, id, dist) — dist = distance from the chosen
    *         set at selection time (0 for the seed; the max-min radius
    *         descends down the rows) */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    import graft.functions.VectorFunctions.sqDist
    val spark = df.sparkSession
    import spark.implicits._
    val base = CacheScope.register(
      df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
        .persist())
    val firstRows = base.orderBy(col(idCol)).limit(1).collect()
    require(firstRows.nonEmpty, "kCenterGreedy needs a non-empty input")
    val first = firstRows.head
    var chosen = List((first.getLong(0), first.getSeq[Double](1), 0.0))
    // Chosen ids are EXCLUDED from each argmax (the mmrSelect contract)
    // and the traversal stops early when the candidates run out, so
    // k > n returns n rows instead of silently re-selecting dist-0
    // duplicates of already-chosen points.
    var exhausted = false
    for (_ <- 2 to k if !exhausted) {
      val dists = chosen.map { case (_, c, _) =>
        sqDist(col("__v"), lit(c.toArray))
      }
      val minDist = round(dists.reduce(least(_, _)), 6)
      val nextRows = base
        .filter(!col(idCol).isin(chosen.map(_._1): _*))
        .select(col(idCol), col("__v"), minDist.as("__d"))
        .orderBy(col("__d").desc, col(idCol))
        .limit(1).collect()
      if (nextRows.isEmpty) exhausted = true
      else {
        val next = nextRows.head
        chosen = chosen :+
          ((next.getLong(0), next.getSeq[Double](1), next.getDouble(2)))
      }
    }
    chosen.zipWithIndex
      .map { case ((id, _, d), i) => (i.toLong + 1, id, d) }
      .toDF("sel_order", idCol, "dist")
  }

  def prototypicality(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int, dropFrac: Double = 0.1,
                      roundTo: Int = 6): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, "dropFrac in [0, 1)")
    val (assigned, _) = kmeans(df, idCol, vecCol, k, iters, roundTo)
    TextAnalysis.calibrateQuality(assigned, idCol, col("dist"),
        col("cluster"), roundTo)
      .withColumnRenamed("quality_pct", "dist_pct")
      .withColumn("keep",
        when(col("dist_pct") <= lit(1.0 - dropFrac), 1L).otherwise(0L))
  }

  /** @return (assignments, centroids): one row per input —
    *         (idCol, cluster, dist) with dist the rounded squared L2 to
    *         the FINAL centroid — and the final (cid, components). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int, roundTo: Int = 6)
      : (DataFrame, Seq[(Int, Seq[Double])]) = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 0, "iters must be >= 0")
    val base = df.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
    var cents: Seq[(Int, Seq[Double])] = base.orderBy(col(idCol)).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    require(cents.size == k, s"need at least $k rows to seed $k clusters")
    val dim = cents.head._2.size

    def assigned: DataFrame = {
      // Two formulations of the same argmin, bit-identical by
      // construction (ClusteringSpec pins parity across the threshold):
      // the literal struct-array fuses into whole-stage codegen and wins
      // at small k; past ExprKMax the tree is tens of thousands of nodes
      // (analysis cost, 64 KB codegen limit → interpreted fallback), so
      // SemDeDup's auto-k (≈ √n) uses the primitive-loop expression.
      val best =
        if (cents.size <= Clustering.ExprKMax) {
          val options = array(cents.map { case (cid, c) =>
            struct(
              round(sqDist(col("__v"), array(c.map(lit): _*)), roundTo)
                .as("d"),
              lit(cid).as("c"))
          }: _*)
          val m = array_min(options)
          // Null-poison degenerate rows (null vector / null element /
          // length mismatch): sqDist then yields null d for EVERY
          // centroid, and struct comparison sorts nulls first, so the
          // bare min would be (null, 0) — cluster 0 with null dist —
          // while the primitive-loop path returns a null row. Matching
          // nulls keeps assignments invariant across the ExprKMax switch.
          when(m.getField("d").isNull, lit(null)).otherwise(m)
        } else org.apache.spark.sql.GraftColumn(
          graft.functions.NearestCentroid(
            org.apache.spark.sql.GraftColumn.expr(col("__v")),
            cents.sortBy(_._1).map(_._2.toArray).toArray, roundTo))
      base.withColumn("__b", best)
        .select(col(idCol), col("__v"),
          col("__b.c").cast("long").as("cluster"), col("__b.d").as("dist"))
    }

    for (_ <- 0 until iters) {
      val aggs = (0 until dim).map(i =>
        round(avg(element_at(col("__v"), i + 1)), roundTo).as(s"__m$i"))
      val rows = assigned.groupBy(col("cluster"))
        .agg(aggs.head, aggs.tail: _*).collect()
      val updated = rows.map { r =>
        r.getLong(0).toInt -> (0 until dim).map(i => r.getDouble(i + 1))
      }.toMap
      cents = cents.map { case (cid, c) =>
        cid -> updated.getOrElse(cid, c)
      }
    }
    (assigned.drop("__v"), cents)
  }
}
