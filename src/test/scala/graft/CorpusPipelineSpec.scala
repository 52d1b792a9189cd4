package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPipeline, SkewJoin}

/** End-to-end corpus preparation + skew-join mitigation specs. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def sf = SparkTestSession.sf0001

  test("prepare: filters compose, near-dups removed, split attached, deterministic") {
    val docs = Tables.load(spark, sf, "documents")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text").persist()
    val n = docs.count()
    val kept = out.count()
    assert(kept > 0 && kept <= n)
    // near-dup removal actually fired (testdata plants near-duplicates)
    assert(kept < n)
    // survivors have no verified near-dup pair among themselves
    val residual = operators.Dedup.ngramJaccardPairs(
      out.select(col("doc_id"), col("text")), "doc_id", "text", 3, 0.5)
    assert(residual.isEmpty)
    // split column present and stable across a rerun
    assert(out.select(col("split")).distinct().count() <= 3)
    val again = CorpusPipeline.prepare(docs.repartition(13), "doc_id", "text")
    assert(out.select(col("doc_id"), col("split"))
      .except(again.select(col("doc_id"), col("split"))).isEmpty)
    out.unpersist()
  }

  test("salted join == plain join, with the key salted nSalts ways") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val customer = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val salted = SkewJoin.saltedInner(orders, customer, "o_custkey", 4)
    val plain = orders.join(customer, Seq("o_custkey"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.count() == plain.count())
  }
}
