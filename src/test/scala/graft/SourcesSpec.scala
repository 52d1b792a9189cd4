package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips (SURVEY §2B scans/sinks): parquet is exercised
  * everywhere; this covers CSV and JSON read/write with explicit schemas
  * (schema-on-read, no inference in production paths). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  test("JSON round-trip preserves rows and types under explicit schema") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val dir = s"${tmp()}/docs_json"
    docs.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == docs.count())
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("CSV round-trip with quoting survives commas/newlines in text") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "newline\ninside")).toDF("id", "text")
    val dir = s"${tmp()}/csv"
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true").option("multiLine", "true")
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("text", StringType))))
      .csv(dir)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("ORC round-trip preserves rows and types") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val dir = s"${tmp()}/docs_orc"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("parquet sink partitioned by a derived column prunes at read") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val dir = s"${tmp()}/by_lang"
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    // partition pruning: the lang predicate must be a PartitionFilter,
    // not a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(one.count() ==
      docs.filter(col("lang") === "en").count())
  }
}
