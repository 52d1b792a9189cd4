package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations (beyond the
  * label-propagation connected components in Dedup): algorithms whose
  * state is one small column per node, recomputed by a join + aggregate
  * per round — the Pregel pattern expressed as DataFrame ops.
  */
object Graph {

  /** PageRank over a directed edge relation, fixed iteration count.
    *
    * Simplified (no dangling-mass redistribution): rᵢ₊₁(v) =
    * (1-d)/N + d · Σ_{(u,v)∈E} rᵢ(u)/outdeg(u). Callers whose graphs
    * have sinks should add reverse edges or accept the leaked mass —
    * for undirected graphs (both directions present) no node is
    * dangling and rank mass is conserved.
    *
    * Determinism contract (the q92 k-means rule for iterative float
    * state): every iteration's rank is ROUNDED after its aggregate, so
    * two engines whose float-sum orders differ stay bit-identical at
    * the fixed point — an unrolled-CTE SQL oracle can reproduce the
    * result exactly.
    *
    * Scale: per iteration, one equi-join of edges against the node-sized
    * rank relation (shuffle on src — or broadcast of ranks when nodes
    * are metadata-sized, AQE's call) and one map-side-combined sum
    * keyed on dst. Nothing driver-side but the node count; state never
    * exceeds one double per node. For deep iteration counts, checkpoint
    * the rank relation every few rounds (the Dedup.connectedComponents
    * parquet round-trip) — at the fixed 3-5 rounds typical for
    * analytics, lineage stays shallow enough without.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               roundTo: Int = 9): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    CacheScope.register(e.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    CacheScope.register(nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // 1/N is a single IEEE division — identical in any engine, no
    // rounding needed on the initial state
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val in = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      ranks = nodes.join(in, Seq("node"), "left")
        .select(col("node"),
          round(lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0)),
            roundTo).as("rank"))
    }
    ranks
  }
}
