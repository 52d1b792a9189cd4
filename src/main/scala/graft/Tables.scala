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
    // The engine's intentional single-partition windows (metadata-sized
    // relations: histograms, shortlists, sketch bins) declare a CONSTANT
    // partition key so WindowExec's "No Partition Defined" warning only
    // fires for accidental corpus-sized global windows. This rule would
    // strip the foldable key and bring the false alarms back; the key
    // costs one literal hash per (metadata-sized) row, so excluding the
    // rule trades nothing measurable for a clean warning channel.
    .config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
    .config("spark.sql.extensions", "graft.GraftExtensions")

  /** Data-scale shuffle sizing for the BENCH entrypoints: shuffles START
    * wide and AQE coalesces them down to the data.
    * spark.sql.shuffle.partitions (= cores locally) is the right FINAL
    * width for fixture-scale work, but it also bounds per-task shuffle
    * block size: the sf10 run showed linear-work queries going 12× per
    * 10× data purely from 32-way shuffles spilling (~10M rows/task).
    * 8×cores initial partitions cost little at small sf (AQE merges them
    * back — parallelismFirst targets the core count) and keep tasks
    * memory-resident at 100× — how a 1000-executor cluster should be
    * configured (large initial, AQE-sized final). NOT in withGraftConf:
    * the test session and Verify run dozens of metadata-sized jobs per
    * query, where 8× the task count is pure scheduler overhead. */
  def withBenchShuffle(b: SparkSession.Builder,
                       cpus: Int): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
        (8 * cpus).toString))

  /** Register every table as a temp view so spark.sql(...) mirrors the
    * DuckDB oracle exactly. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
