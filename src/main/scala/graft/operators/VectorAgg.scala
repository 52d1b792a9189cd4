package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector-column aggregation: elementwise pooling of fixed-dim vectors
  * per group — chunk→document embedding pooling, per-cluster centroid
  * computation, class prototypes. The reference has no aggregation at
  * all; this is the vector-native member of the extension aggregate
  * family (SURVEY.md §2B).
  */
object VectorAgg {

  /** Per-group elementwise mean and member count: one hash aggregation
    * with `dim` scalar avg aggregates over `element_at` projections.
    *
    * Scale shape: deliberately NOT posexplode + groupBy(group, pos) —
    * that shuffles rows × dim records; this shuffles one partial state
    * per group per partition (map-side combine on every aggregate), the
    * same plan shape as any wide numeric rollup. dim is a schema
    * constant, so the wide agg list is fixed at plan time.
    *
    * @return (groupCols…, n, mean_vec: array<double> of length dim)
    */
  def meanVector(df: DataFrame, groupCols: Seq[String], vecCol: String,
                 dim: Int): DataFrame = {
    require(dim > 0 && groupCols.nonEmpty, "need dim > 0 and group keys")
    val v = col(vecCol).cast("array<double>")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        array((1 to dim).map(i => avg(element_at(v, i))): _*)
          .as("mean_vec"))
  }

  /** Embedding-distribution DRIFT between two corpus snapshots: per
    * group, the squared L2 distance between the two snapshots' centroids
    * plus both member counts — the embedding-space twin of the token
    * drift report (q99): "which classes/clusters moved between crawls".
    * A centroid shift is the cheapest useful distribution-shift signal
    * on an embedding column; per-group counts expose population churn
    * alongside the semantic moves.
    *
    * Determinism contract: centroid elements are rounded to `roundTo`
    * BEFORE the distance (avg merge order perturbs the last ulps; the
    * q72 contract), then the fixed-order sqDist fold runs on identical
    * inputs in both engines. Groups absent from one side are dropped
    * (inner join) — drift of a new/vanished group is population churn,
    * visible in a snapshotDiff-style count report, not a distance.
    *
    * Scale: two meanVector aggregates (map-side-combined, one partial
    * per group per partition) + one groups-sized join. */
  def centroidDrift(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                    vecCol: String, dim: Int,
                    roundTo: Int = 6): DataFrame = {
    import graft.functions.VectorFunctions
    def side(df: DataFrame, suffix: String) =
      meanVector(df, groupCols, vecCol, dim)
        .select(groupCols.map(col) :+ col("n").as(s"n_$suffix") :+
          transform(col("mean_vec"), x => round(x, roundTo))
            .as(s"__v$suffix"): _*)
    side(a, "a").join(side(b, "b"), groupCols)
      .withColumn("drift",
        round(VectorFunctions.sqDist(col("__va"), col("__vb")), roundTo))
      .select(groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
        col("drift"): _*)
  }

  /** Rademacher (±1) random projection to `outDim` dimensions — the
    * Johnson-Lindenstrauss dimensionality cut that shrinks embedding
    * bytes ahead of ANN/dedup (Achlioptas '01: ±1 entries preserve
    * pairwise distances like Gaussian ones, and the matrix needs no
    * storage because entry (i, j) derives from md5, the established
    * engine-portable hash family). Scaled by 1/√outDim; with outDim a
    * perfect square the scale is an exact power-of-two-free division —
    * callers wanting bit-exact cross-engine output (the oracle does)
    * should keep outDim a perfect square so √outDim is exact.
    *
    * Pure per-row expression work (a fixed outDim × dim fold compiled
    * into the projection — no shuffle, no UDF, scan speed); the fold
    * accumulates left-to-right over i so any engine reproducing the
    * same order reproduces the sums bit-for-bit.
    *
    * @return original columns with `outCol` = array<double>(outDim) */
  def randomProjection(df: DataFrame, vecCol: String, dim: Int,
                       outDim: Int, outCol: String = "proj",
                       roundTo: Int = 6): DataFrame = {
    require(dim > 0 && outDim > 0, "need dim > 0 and outDim > 0")
    // sign(i, j) = +1 / -1 from the low bit of md5("i#j")'s first hex
    // char — precomputed driver-side (outDim × dim ints of metadata) and
    // applied by the RademacherProject expression in one primitive pass
    // per row. The aggregate()-HoF formulation this replaces evaluated
    // its lambda interpreted per term (45 s for the q153 scan at sf1);
    // the expression is bit-identical (same fold order, same HALF_UP
    // rounding) and the DuckDB oracle derives the same matrix from the
    // same md5 family.
    val mdKey = java.security.MessageDigest.getInstance("MD5")
    def signOf(i: Int, j: Int): Int = {
      val d = mdKey.digest(s"$i#$j".getBytes("UTF-8"))
      val firstHex = (d(0) >> 4) & 0xf
      1 - 2 * (firstHex % 2)
    }
    val signs = Array.tabulate(outDim, dim)((j, i) => signOf(i, j))
    val expr = graft.functions.RademacherProject(
      org.apache.spark.sql.GraftColumn.expr(
        col(vecCol).cast("array<double>")),
      signs, math.sqrt(outDim.toDouble), roundTo)
    df.withColumn(outCol, org.apache.spark.sql.GraftColumn(expr))
  }
}
