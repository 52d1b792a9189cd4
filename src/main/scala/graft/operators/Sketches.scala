package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for streams and 100 TB corpora.
  *
  * A Count-Min sketch answers "how often does key x occur?" in
  * depth × width space, independent of cardinality: counter[d][h_d(x)]
  * accumulates every occurrence whose d-th hash lands in that bucket, and
  * the estimate min_d counter[d][h_d(x)] is an upper bound on the true
  * count (never under, over only by collisions — ε ≈ e/width of the
  * stream mass, with failure probability e^-depth). The counters relation
  * here IS the sketch: depth × width rows, trivially mergeable by
  * (seed, bucket) sum across batches/days/shards — the property that
  * makes it the standard heavy-hitter structure for streams.
  *
  * Hashes are the engine-portable md5 construction shared with
  * Sampling.hashBucket (first 8 hex chars as uint32, mod width), salted
  * with the row index "d#", so a DuckDB/any-SQL oracle computes the
  * identical sketch bit-for-bit.
  */
object Sketches {

  /** Build the Count-Min counters for a key column.
    *
    * Scale: pre-aggregates to the key's cardinality FIRST (one map-side-
    * combined shuffle — the same vocab shuffle every LM operator here
    * pays), then explodes only the vocab relation ×depth and reduces to
    * depth × width counters. The corpus stream is never multiplied by
    * depth, and nothing downstream ever exceeds depth × width rows.
    *
    * @return (seed, bucket, counter) — exactly the CMS array, one row
    *         per non-empty cell */
  def countMinCounters(df: DataFrame, keyCol: Column,
                       depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    df.select(keyCol.cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
      .select(col("__k"), col("__c"),
        explode(array((0 until depth).map(lit(_)): _*)).as("seed"))
      .withColumn("bucket",
        Sampling.hashBucket(concat_ws("#", col("seed"), col("__k")), width))
      .groupBy(col("seed"), col("bucket"))
      .agg(sum(col("__c")).as("counter"))
  }

  /** The sketch AT REST: `saveCounters` writes the counter relation;
    * `appendCounters` adds a new batch's PARTIAL counters as new files —
    * no read-modify-write, the mergeability doing the work; `loadCounters`
    * folds all partials back to one cell per (seed, bucket). This is the
    * streaming/incremental heavy-hitter cadence at 100 TB: each
    * micro-batch/day/shard appends its own depth × width relation, and a
    * reader pays one tiny reduce over |batches| × depth × width rows. */
  def saveCounters(counters: DataFrame, path: String): Unit =
    counters.write.mode("overwrite").parquet(path)

  /** Append a batch's partial counters (same depth/width — the caller's
    * contract, as with every saved-layout geometry here). */
  def appendCounters(counters: DataFrame, path: String): Unit =
    counters.write.mode("append").parquet(path)

  /** Load and fold the at-rest partials to the canonical sketch. */
  def loadCounters(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("seed"), col("bucket"))
      .agg(sum(col("counter")).as("counter"))

  /** Point-query the sketch for each probe key: est = min over depth rows
    * of the counter the key hashes into (0 if the cell is empty — the
    * key was never seen). Probes × depth join the depth × width counters
    * — broadcast-sized by construction, whatever the corpus was. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: Column,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val p = probes.withColumn("__k", keyCol.cast("string"))
      .withColumn("seed",
        explode(array((0 until depth).map(lit(_)): _*)))
      .withColumn("bucket",
        Sampling.hashBucket(concat_ws("#", col("seed"), col("__k")), width))
    p.join(broadcast(counters), Seq("seed", "bucket"), "left")
      .groupBy(col("__k").as("key"))
      .agg(min(coalesce(col("counter"), lit(0L))).as("est"))
  }
}
