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
    * exceeds one double per node.
    *
    * Deep iteration counts: every `checkpointEvery` rounds the rank
    * relation's lineage is CUT — through `checkpointDir` (parquet
    * round-trip under dir/pr-<uuid>/round_N, replayable from files
    * after executor loss; caller deletes the dir once consumed —
    * exactly Dedup.connectedComponents' cadence) or, without a dir, a
    * lazy localCheckpoint. Otherwise the plan nests one join+aggregate
    * per round and Catalyst re-analyzes the whole tower each iteration
    * — quadratic driver work that dominates past ~10 rounds. Rank
    * VALUES are unaffected: the cut replays rounded doubles, and every
    * round is rounded already (the determinism contract above).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               roundTo: Int = 9, checkpointEvery: Int = 5,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val ckptBase = checkpointDir.map(d =>
      s"$d/pr-${java.util.UUID.randomUUID()}")
    var ckptN = 0
    def ckpt(df: DataFrame): DataFrame = ckptBase match {
      case Some(dir) =>
        val p = s"$dir/round_$ckptN"; ckptN += 1
        df.write.parquet(p)
        df.sparkSession.read.parquet(p)
      case None => df.localCheckpoint(eager = false)
    }
    // e is consumed by BOTH derived relations below (degree-annotated
    // edges, node set): persist it so the caller's edge-construction
    // lineage — typically a full fact-table scan — runs once
    val e = CacheScope.register(
      edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // out-degree rides ON the persisted edge relation, attached once:
    // each iteration then pays ONE join (the rank state) instead of two
    // and never re-aggregates the edges
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val ew = CacheScope.register(e.join(outdeg, "src").persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nodes = CacheScope.register(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = nodes.count()
    // A node with NO in-edges holds the constant teleport rank
    // (1-d)/N from iteration 1 onward — computed ONCE and UNIONed back
    // each round (a union is plan-free), instead of a per-iteration
    // left join against the node set. The aggregate's output already
    // covers every in-degree>0 node, so the union is exactly the
    // missing rows. Cuts one join stage per iteration.
    val zeroIn = CacheScope.register(
      nodes.join(e.select(col("dst").as("node")).distinct(),
          Seq("node"), "left_anti")
        .select(col("node"),
          round(lit((1.0 - damping) / n), roundTo).as("rank"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // 1/N is a single IEEE division — identical in any engine, no
    // rounding needed on the initial state
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val in = ew.join(ranks, ew("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      ranks = in
        .select(col("node"),
          round(lit((1.0 - damping) / n) +
            lit(damping) * col("__in"), roundTo).as("rank"))
        .union(zeroIn)
      // cut mid-loop only: the final round's plan is the caller's to
      // consume (writing it to parquet would force an eager job here)
      if (i % checkpointEvery == 0 && i < iters) ranks = ckpt(ranks)
    }
    ranks
  }
}
