package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** The bounded top-k Aggregator path must return exactly what the window
  * path returns (same tie-break contract), while keeping candidate rows on
  * the map side (partial aggregation before the exchange). */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def sf = SparkTestSession.sf0001

  test("knnBatchAgg == knnBatch (window) on embeddings, incl. ties contract") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") <= 7)
      .select(col("vec_id").as("qid"), col("embedding"))
    val agg = Search.knnBatchAgg(e, "embedding", "vec_id", q, "embedding",
        "qid", k = 5, excludeSelf = true)
      .select(col("qid"), col("vec_id").cast("long").as("vec_id"),
        col("dist"), col("rn"))
    val win = Search.knnBatch(e, "embedding", "vec_id", q, "embedding",
        "qid", k = 5, excludeSelf = true)
      .select(col("qid"), col("vec_id").cast("long").as("vec_id"),
        col("dist"), col("rn"))
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
    assert(agg.count() == q.count() * 5)
  }

  test("duplicate points at distance 0 legitimately fill the result (2A#6)") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)),
      (3L, Seq(0.0, 0.0)), (4L, Seq(9.0, 9.0))).toDF("id", "vec")
    val q = Seq((100L, Seq(0.0, 0.0))).toDF("qid", "qv")
    val got = Search.knnBatchAgg(df, "vec", "id", q, "qv", "qid", k = 3)
      .orderBy(col("rn")).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L)) // id tie-break
    assert(got.forall(_.getDouble(2) == 0.0))
  }

  test("partial aggregation happens before the exchange (plan shape)") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") <= 1)
      .select(col("vec_id").as("qid"), col("embedding"))
    val plan = Search.knnBatchAgg(e, "embedding", "vec_id", q, "embedding",
      "qid", k = 3).queryExecution.executedPlan.toString
    // ObjectHashAggregate(partial) must appear below the qid exchange
    assert(plan.contains("ObjectHashAggregate"))
    val firstAgg = plan.indexOf("ObjectHashAggregate")
    val lastAgg = plan.lastIndexOf("ObjectHashAggregate")
    val exch = plan.indexOf("Exchange hashpartitioning(qid")
    assert(firstAgg >= 0 && lastAgg > firstAgg && exch > firstAgg &&
      exch < lastAgg, s"expected partial agg / exchange / final agg:\n$plan")
  }
}
