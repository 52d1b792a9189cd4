package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group top-k as a Spark `Aggregator`: the reference's replace-worst
  * bounded result buffer (include/pktree.hpp:1000-1031), distributed —
  * partial aggregation keeps at most k rows per (mapper, group) ahead of
  * the shuffle.
  *
  * Measured honesty (sf0.1, 64 queries × 50k vectors): Spark 4's window
  * form is JUST AS shuffle-bounded — the optimizer plans a partial
  * `WindowGroupLimit` below the exchange — and 2× faster end-to-end
  * (0.64 s vs 1.23 s), because the UDAF pays per-row typed
  * deserialization that WindowGroupLimit's codegen'd rank pruning does
  * not. So `row_number <= k` is the default top-k form throughout the
  * engine; THIS aggregator is for the cases a window can't express:
  * fusing top-k with other aggregates in one groupBy pass
  * (`agg(count(*), avg(x), topK(k)(score, id))` — one shuffle instead of
  * two jobs), and aggregation-only contexts.
  *
  * Ordering: ascending (score, id) — the engine's documented kNN
  * tie-break (smallest id wins, SURVEY 2A#4). For descending semantics
  * (cosine similarity) negate the score on the way in.
  */
object TopK {

  case class ScoredId(score: Double, id: Long)

  /** Bounded ascending-(score, id) top-k buffer. The buffer is a plain
    * sorted Seq (k is small); reduce does an insertion-capped merge. */
  class TopKByScore(k: Int)
      extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k > 0, "k must be positive")

    private val ord: Ordering[ScoredId] =
      Ordering.by(s => (s.score, s.id))

    override def zero: Seq[ScoredId] = Vector.empty

    override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      if (b.size >= k && ord.gteq(a, b.last)) b // worse than current worst
      else ((b :+ a).sorted(ord)).take(k)

    override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
      (b1 ++ b2).sorted(ord).take(k)

    override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      bufferEncoder
  }

  /** Column-API handle: topK(k)(scoreCol, idCol) -> array<struct<score,id>>
    * sorted ascending by (score, id). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    implicit val inputEnc: Encoder[ScoredId] = Encoders.product[ScoredId]
    udaf(new TopKByScore(k), inputEnc)
  }
}
