package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.sqDist
import graft.operators.{GridIndex, Search}
import graft.plans.IndexAwareRules

/** The optimizer rule must turn a plain ball predicate over a registered
  * index into a cell-pruned scan — same rows, pruned plan — with no
  * user-side API change. */
class IndexAwareRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val (indexPath, spec) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val p = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val s = GridIndex.fit(p, "vec", dim = 2, cellsPerDim = 8)
    GridIndex.buildIndex(p, "vec", s, s"$tmp/part_idx")
    (s"$tmp/part_idx", s)
  }
  private val q = Seq(910.0, 25.0)
  private val r = 20.0

  test("ball filter over a registered index gains a pushed cell_id IN filter") {
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    val query = idx.filter(
      sqDist(col("vec"), array(q.map(lit): _*)) <= lit(r * r))

    val optimized = query.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cell_id IN") ||
      optimized.contains("cell_id#"), s"no cell conjunct:\n$optimized")
    val physical = query.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("In(cell_id"),
      s"cell filter not pushed to parquet:\n$physical")

    // lossless: identical rows to the unpruned scan
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.rangeSearch(raw, "vec", array(q.map(lit): _*), r)
      .select(col("p_partkey"))
    assert(query.select(col("p_partkey")).except(expect).isEmpty &&
      expect.except(query.select(col("p_partkey"))).isEmpty)
  }

  test("plain SQL over the saved index auto-prunes (full SQL-user path)") {
    GraftExtensions.register(spark)
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val sqlDf = spark.sql(
      s"""SELECT p_partkey FROM parquet.`$indexPath`
         |WHERE graft_sqdist(vec, array(910.0D, 25.0D)) <= 400.0D
         |ORDER BY p_partkey""".stripMargin)
    assert(sqlDf.queryExecution.executedPlan.toString.contains("In(cell_id"),
      "SQL text should hit the same pruned plan")
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.rangeSearch(raw, "vec", array(q.map(lit): _*), r)
      .select(col("p_partkey")).orderBy(col("p_partkey"))
    assert(sqlDf.collect().map(_.getLong(0)).toSeq ==
      expect.collect().map(_.getLong(0)).toSeq)
  }

  test("unregistered paths and non-ball filters are left untouched") {
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    IndexAwareRules.clear() // deregister: rule must no-op now
    try {
      val query = idx.filter(
        sqDist(col("vec"), array(q.map(lit): _*)) <= lit(r * r))
      val optimized = query.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cell_id IN"))
      val plain = idx.filter(col("p_size") > 10)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("cell_id IN"))
    } finally IndexAwareRules.registerIndex(indexPath, spec)
  }
}
