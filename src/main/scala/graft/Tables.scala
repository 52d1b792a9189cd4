package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. "/root/testdata/sf0.01") and read the
  * Parquet tables below. At 100 TB these would be partitioned table paths;
  * the API shape (path in, DataFrame out, no collect) is scale-independent.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) in Parquet, which Spark's Parquet reader
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * `withGraftConf`), in which case it surfaces as LongType nanos.
    * Normalized here to a microsecond TimestampType column so event-time
    * functions (window, watermark) and DuckDB comparisons agree. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case _ => raw
    }
  }

  /** Session configs every graft session needs (Verify, Bench, tests).
    * The engine's extensions ride in via spark.sql.extensions: graft_*
    * SQL functions plus the optimizer rules (index-aware pruning over
    * registered paths — a no-op until something registers — and the
    * early-exit ball-predicate fuse, which is semantics-preserving
    * everywhere it fires). */
  def withGraftConf(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // SPARK_GRAFT_AQE=false: measurement knob for the per-round AQE
    // re-planning cost inside fixed-shape iterative loops (graph
    // family) — production default stays on
    .config("spark.sql.adaptive.enabled",
      sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
    .config("spark.sql.extensions", "graft.GraftExtensions")

  /** Register every table as a temp view so spark.sql(...) mirrors the
    * DuckDB oracle exactly. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
