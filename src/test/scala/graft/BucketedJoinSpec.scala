package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing is the 100 TB co-location strategy (SURVEY §4 physical
  * notes): two tables bucketed on the join key with the same bucket count
  * join WITHOUT any Exchange — the shuffle happened once at write time and
  * is amortized over every subsequent join. This spec proves the plan
  * shape, not just the result. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("same-bucketing equi-join plans with zero Exchange") {
    val dir = SparkTestSession.sf0001
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.load(spark, dir, "customer")
      .write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not re-shuffle the join key:\n$plan")
      // result parity with the plain-parquet join
      val expect = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(joined.except(expect).isEmpty && expect.except(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
