package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Search

/** Driver contract — one entry per implemented operator (SURVEY.md §2), plus
  * DuckDB oracle SQL for each. Column names are aligned between the Spark
  * result and the oracle SQL (driver sorts columns by name before hashing).
  * Every query ends in an ORDER BY ending with a unique key, so row order is
  * deterministic in both engines.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * kNN top-10 over the 64-dim embeddings (the reference's core ability). */
  def entry(spark: SparkSession): DataFrame =
    q2knn(spark, "/root/testdata/sf0.001")

  // ===========================================================================
  // §2C declared queries
  // ===========================================================================

  /** Q1 — scan + project + filter (R1). */
  private def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** Q2 — single-query exact kNN, squared L2, k=10 (R5/R6). Query vector =
    * embedding of vec_id 0; self included (dist 0 row) like the reference,
    * which never dedups (SURVEY §2A semantics #6). */
  private def q2knn(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val qv = broadcast(e.filter(col("vec_id") === 0)
      .select(col("embedding").as("__qv")))
    Search.knn(e.crossJoin(qv), "embedding", "vec_id", col("__qv"), 10)
      .select(col("vec_id"), col("dist"))
  }

  /** Q3 — inclusive range (ball) search on the 2-D part fixture (R7/R8). */
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    Search.rangeSearch(p, "vec", array(lit(950.0), lit(25.0)), 20.0)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** Q4 — batch kNN: 5 query vectors, top-3 each, excluding self (R5 × batch,
    * window top-k). */
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") <= 4)
      .select(col("vec_id").as("qid"), col("embedding"))
    Search.knnBatch(e, "embedding", "vec_id", q, "embedding", "qid",
        k = 3, excludeSelf = true)
      .select(col("qid"), col("vec_id"), col("dist"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Q5 — similarity self-join (band join): customer pairs with
    * |acctbal_1 - acctbal_2| <= 1.0. Implemented 100-TB-safe: bucket by
    * floor(acctbal), expand left side to adjacent buckets, equi-join on
    * bucket, then exact filter — O(pairs-in-band), never O(n²). */
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val left = c.withColumn("b",
        explode(array(floor(col("c_acctbal")) - 1, floor(col("c_acctbal")),
          floor(col("c_acctbal")) + 1)))
      .select(col("c_custkey").as("k1"), col("c_acctbal").as("a1"), col("b"))
    val right = c
      .select(col("c_custkey").as("k2"), col("c_acctbal").as("a2"),
        floor(col("c_acctbal")).as("b"))
    left.join(right, "b")
      .filter(col("k1") < col("k2") && abs(col("a1") - col("a2")) <= 1.0)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Q6 — exact dedup: distinct (lang, source) of documents (2B dedup). */
  private def q6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), col("source"))
      .distinct()
      .orderBy(col("lang"), col("source"))

  /** Q7 — hash aggregation with partial (map-side) combine (2B agg). */
  private def q7(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q8 — equi join + agg; customer is the small (broadcast) side. */
  private def q8(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice")).as("sum_price"))
      .withColumn("sum_price", round(col("sum_price"), 2))
      .orderBy(col("c_mktsegment"))
  }

  /** Q9 — window rank: top-3 orders by totalprice per customer (2B window). */
  private def q9(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Q10 — set op: order keys with no lineitem (EXCEPT = distinct anti). */
  private def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey").as("okey"))
      .except(t(s, dir, "lineitem").select(col("l_orderkey").as("okey")))
      .orderBy(col("okey"))

  /** Q11 — text/string functions: per-language char + token stats (2B text).
    * Tokens = single-space split, identical in both engines. */
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("sum_chars"),
        sum(col("n_tok")).as("sum_tokens"))
      .orderBy(col("lang"))

  /** Q12 — date functions: orders per year (2B scalar/date). */
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("yr"))

  /** Q13 — global sort + limit → TakeOrderedAndProject, no full sort (R18). */
  private def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100)

  /** Q14 — event-time tumbling window (1h) counts, batch-checkable form of
    * the streaming aggregation (2B streaming; streaming path in
    * graft.streaming.EventWindows shares this exact groupBy). Window start
    * exposed as epoch seconds so both engines compare integer values. */
  private def q14(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(unix_timestamp(col("wstart")).as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  // ===========================================================================
  // Registry
  // ===========================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_filter" -> (q1 _),
    "q2_knn" -> (q2knn _),
    "q3_range" -> (q3 _),
    "q4_knn_batch" -> (q4 _),
    "q5_simjoin" -> (q5 _),
    "q6_dedup_exact" -> (q6 _),
    "q7_agg" -> (q7 _),
    "q8_join_agg" -> (q8 _),
    "q9_window" -> (q9 _),
    "q10_setop" -> (q10 _),
    "q11_text" -> (q11 _),
    "q12_date" -> (q12 _),
    "q13_sort_limit" -> (q13 _),
    "q14_events_window" -> (q14 _),
  )

  /** Squared-L2 DuckDB fragment between a list column and a correlated list
    * expression — mirrors VectorFunctions.sqDist's left-to-right fold. */
  private def duckSqDist(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      "s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * " +
      "(CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))))"

  def oracleSql: Map[String, String] = Map(
    "q1_filter" ->
      """SELECT p_partkey, p_name FROM part WHERE p_size <= 10
        |ORDER BY p_partkey""".stripMargin,
    "q2_knn" ->
      s"""SELECT e.vec_id, ROUND(${duckSqDist("e.embedding", "q.qv")}, 6) AS dist
         |FROM embeddings e,
         |     (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,
    "q3_range" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part
        |WHERE (CAST(p_retailprice AS DOUBLE) - 950.0) * (CAST(p_retailprice AS DOUBLE) - 950.0)
        |    + (CAST(p_size AS DOUBLE) - 25.0) * (CAST(p_size AS DOUBLE) - 25.0) <= 20.0 * 20.0
        |ORDER BY p_partkey""".stripMargin,
    "q4_knn_batch" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |           WHERE vec_id <= 4),
         |d AS (SELECT q.qid, e.vec_id,
         |             ROUND(${duckSqDist("e.embedding", "q.qv")}, 6) AS dist
         |      FROM embeddings e, q WHERE e.vec_id <> q.qid)
         |SELECT qid, vec_id, dist, rn FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
         |  FROM d) WHERE rn <= 3
         |ORDER BY qid, rn""".stripMargin,
    "q5_simjoin" ->
      """SELECT count(*) AS n_pairs
        |FROM customer c1 JOIN customer c2
        |  ON c1.c_custkey < c2.c_custkey
        | AND abs(c1.c_acctbal - c2.c_acctbal) <= 1.0""".stripMargin,
    "q6_dedup_exact" ->
      """SELECT DISTINCT lang, source FROM documents
        |ORDER BY lang, source""".stripMargin,
    "q7_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q8_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       ROUND(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q9_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q10_setop" ->
      """SELECT o_orderkey AS okey FROM orders
        |EXCEPT SELECT l_orderkey AS okey FROM lineitem
        |ORDER BY okey""".stripMargin,
    "q11_text" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q12_date" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "q13_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q14_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS wstart,
        |       event_type, count(*) AS n, ROUND(sum(value), 6) AS sum_value
        |FROM events GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin,
  )
}
