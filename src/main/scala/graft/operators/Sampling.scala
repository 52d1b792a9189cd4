package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting operators for training-data pipelines.
  *
  * Everything is keyed on a content/id hash, never on randomness or row
  * order: re-running the pipeline on re-partitioned (or re-scaled) data
  * assigns every row to the same split — the property that keeps
  * train/test contamination impossible across pipeline re-runs.
  */
object Sampling {

  /** Engine-portable uniform bucket in [0, nBuckets): first 8 hex chars of
    * md5 parsed as an unsigned 32-bit int, mod nBuckets. md5 (not
    * xxhash64) because the DuckDB oracle computes the identical value:
    * CAST('0x' || substr(md5(x), 1, 8) AS UBIGINT) % n. */
  def hashBucket(key: Column, nBuckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % nBuckets

  /** Deterministic train/val/test split by id hash: fractions are
    * percentages over the 100-bucket hash space. A row's split depends
    * only on its id — stable under reruns, appends, and repartitioning. */
  def trainValTest(df: DataFrame, idCol: String,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "need a non-empty test slice")
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Weighted Bernoulli sample: keep each row with probability equal to
    * `weight` (an expression in [0, 1] — e.g. a quality score, or
    * count/cap for frequency-aware downsampling). The coin is the row's
    * id hash scaled to [0, 1): deterministic, partition-independent, and
    * engine-portable like every sampler here. Scan-speed filter, no
    * shuffle. The hash is salted ("#w") so a row's sampling coin is
    * independent of its trainValTest bucket — sampling then splitting
    * introduces no correlation. */
  def weightedSample(df: DataFrame, idCol: String,
                     weight: Column): DataFrame = {
    val u = hashBucket(concat_ws("#", col(idCol), lit("w")), 1000000)
      .cast("double") / 1000000.0
    df.filter(u < least(greatest(weight, lit(0.0)), lit(1.0)))
  }

  /** Deterministic per-stratum downsample: keep ~fraction of rows in each
    * stratum, chosen by id hash (no sample(), no seed drift across runs).
    * At 100 TB this is a scan-speed filter — no shuffle at all. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction in (0, 1]")
    // salt the hash with the stratum so per-stratum selections are
    // independent even for correlated id ranges
    val b = hashBucket(concat_ws("#", col(strataCol), col(idCol)), 10000)
    df.filter(b < (fraction * 10000).toInt)
  }
}
