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

  /** DATA-SIZED initial shuffle width for the BENCH entrypoints —
    * partitions track the dataset, exactly how a real cluster is sized.
    * spark.sql.shuffle.partitions (= cores locally) is the right FINAL
    * width for fixture-scale work, but it also bounds per-task shuffle
    * block size: the sf10 run showed linear-work queries going 12× per
    * 10× data purely from 32-way shuffles spilling (~10M rows/task).
    * r10 answered with a flat 8×cores initial width and AQE coalescing
    * down — but MEASURED at sf0.1 that costs 25-40% on multi-stage
    * pipeline queries (a few hundred near-empty reduce tasks per stage
    * × many stages; q59 6.1→8.9 s, q73 9.9→13.7 s), so the flat knob
    * was trading the small end for the big one. Instead: initial
    * partitions = input bytes / 4 MB of parquet (≈100 MB of in-flight
    * shuffle per task at the observed ~25× parquet-to-shuffle
    * amplification), clamped to [cores, 2×cores]. sf0.1/sf1 land on
    * `cores` (the measured-best width there), sf10 on 2×cores, and the
    * clamp keeps the knob harmless on empty or enormous dirs. The
    * upper clamp was 8×cores in r11's first cut; the post-fix ×100 A/B
    * measured it against 2×cores and 2× won across the board — the
    * iterative family pays the initial width on EVERY round's
    * node-state exchange (PPR 315→124 s, PageRank 189→105, triangles
    * 193→125 at sf10) and even the spill-prone shingle joins prefer it
    * (exact prefix-Jaccard 366→225; 32-wide still spills: 516). On a
    * real cluster `cores` is the executor total, so the absolute width
    * still scales out; what this clamp encodes is per-CORE width, and
    * 2 strikes the measured balance between per-task spill and
    * per-round scheduler floor. SPARK_GRAFT_INITIAL_PARTITIONS
    * overrides for measurement. NOT in withGraftConf: the test session and Verify
    * run dozens of metadata-sized jobs per query, where extra task
    * count is pure scheduler overhead. */
  def withBenchShuffle(b: SparkSession.Builder, cpus: Int,
                       sfDir: String): SparkSession.Builder = {
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    val sized = dirBytes(new java.io.File(sfDir)) / (4L << 20)
    val initial = math.min(math.max(sized, cpus.toLong), 2L * cpus)
    b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
        initial.toString))
  }

  /** Register every table as a temp view so spark.sql(...) mirrors the
    * DuckDB oracle exactly. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
