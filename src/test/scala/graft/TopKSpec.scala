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

  test("L2-kNN over normalized vectors ranks exactly like cosine top-k") {
    // sqDist(â, q̂) = 2 - 2·cos(a, q): the normalize-at-build reduction
    // that lets the L2 index machinery serve cosine queries.
    val e = Tables.load(spark, sf, "embeddings")
    val norm = e.withColumn("nv",
      graft.functions.VectorFunctions.normalize(col("embedding")))
    val q = norm.filter(col("vec_id") <= 3)
      .select(col("vec_id").as("qid"), col("nv"))
    val byL2 = Search.knnBatch(norm, "nv", "vec_id", q, "nv", "qid",
        k = 5, roundTo = 9)
      .select(col("qid"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byCos = Search.cosineTopK(e, "embedding", "vec_id", q
        .join(e.select(col("vec_id").as("qid"), col("embedding")), Seq("qid")),
        "embedding", "qid", k = 5, roundTo = 9)
      .select(col("qid"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(byL2 == byCos)
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
