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

  /** Mergeable fixed-grid HISTOGRAM sketch: `nBins` equal-width bins
    * over a caller-fixed [lo, hi) domain; (bin, cnt) rows ARE the
    * sketch. Like the CMS, mergeability by bin-sum is the whole design
    * — batches/days/shards append partial histograms, the reader folds.
    * Values outside the domain clamp into the end bins (sketch
    * semantics: extreme quantile estimates degrade, determinism never
    * does). The fixed grid is the caller's contract — the price of
    * mergeability; data-adaptive bin edges (t-digest and friends) merge
    * only approximately and would break the exact-oracle gate.
    *
    * Scale: one map-side-combined groupBy to at most nBins rows. */
  def histogramCounts(df: DataFrame, valueCol: Column, lo: Double,
                      hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need hi > lo and nBins > 0")
    val w = (hi - lo) / nBins
    val bin = least(greatest(
      floor((valueCol.cast("double") - lo) / w).cast("long"), lit(0L)),
      lit(nBins - 1L))
    df.select(bin.as("bin")).groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The histogram at rest — the q113 counter-lifecycle applied to the
    * quantile sketch: save whole, append partials as new files,
    * load-fold to canonical. */
  def saveHistogram(hist: DataFrame, path: String): Unit =
    hist.write.mode("overwrite").parquet(path)

  def appendHistogram(hist: DataFrame, path: String): Unit =
    hist.write.mode("append").parquet(path)

  def loadHistogram(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from the folded histogram: for each requested p,
    * the bin holding rank p·N (cumBefore < p·N <= cum) with linear
    * interpolation inside it — `lo + w·(bin + (p·N - cumBefore)/cnt)`,
    * one fixed-order float expression from exact integer counts (the
    * engine-portability contract every scoring operator here follows).
    * Estimation error is bounded by one bin width; exactness of the
    * ESTIMATE (same inputs → same bits) is what the oracle checks.
    *
    * The cumulative window runs on sketch-sized data (<= nBins rows) —
    * a single-partition sort of a few hundred rows, never corpus data. */
  def histogramQuantiles(hist: DataFrame, lo: Double, hi: Double,
                         nBins: Int, ps: Seq[Double]): DataFrame = {
    require(ps.forall(p => p > 0 && p <= 1), "quantiles in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / nBins
    // constant partition key: same single-partition execution over the
    // sketch-sized relation, but declared — WindowExec's "No Partition
    // Defined" warning then only fires for ACCIDENTAL global windows
    val cum = hist
      .withColumn("__cum", sum(col("cnt")).over(
        Window.partitionBy(lit(0)).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__before", col("__cum") - col("cnt"))
    val n = hist.agg(sum(col("cnt")).cast("double").as("__n"))
    val probes = ps.foldLeft(Option.empty[DataFrame]) { (acc, p) =>
      val one = n.sparkSession.range(1).select(lit(p).as("p"))
      Some(acc.fold(one)(_ union one))
    }.get
    probes.crossJoin(broadcast(n))
      .withColumn("__t", col("p") * col("__n"))
      .join(cum,
        col("__before") < col("__t") && col("__t") <= col("__cum"))
      .select(col("p"),
        round(lit(lo) + lit(w) * (col("bin")
          + (col("__t") - col("__before")) / col("cnt")), 6).as("est"))
  }

  /** HyperLogLog registers as a RELATION — the distinct-count sketch in
    * the same at-rest cadence as the CMS and the histogram, with the
    * third merge monoid: counters merge by SUM, bins by SUM, HLL
    * registers by MAX. (group, bucket, reg) rows, one per non-empty
    * register: bucket = md5-uint32 mod m (the engine-portable
    * Sampling.hashBucket construction), reg = max over keys of
    * rho(key) = leading zeros + 1 of a SECOND md5-derived 32-bit word.
    * rho comes from `33 - length(bin(x))` — bin() prints without
    * leading zeros in Spark AND DuckDB, so an any-SQL oracle computes
    * the identical register file bit-for-bit; no floating log2 at the
    * boundary.
    *
    * Scale: one map-side-combined aggregate to ≤ groups × m rows; the
    * stream is scanned once. Flajolet et al.'s standard-HLL bias
    * correction (alpha_m, small-range linear counting) lives in
    * [[hllEstimate]]. 32-bit hash ⇒ fine below ~10⁸ distinct per
    * group; the large-range correction is deliberately omitted (the
    * estimator is exact-oracle-checked, not asymptotically tuned). */
  def hllRegisters(df: DataFrame, keyCol: Column, m: Int = 256,
                   groupCols: Seq[String] = Nil): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m a power of two >= 16")
    val h = md5(keyCol.cast("string"))
    val bucket = (conv(substring(h, 1, 8), 16, 10).cast("long") % m)
      .as("bucket")
    val x = conv(substring(h, 9, 8), 16, 10).cast("long")
    val rho = when(x === 0, lit(33L))
      .otherwise(lit(33L) - length(bin(x)).cast("long")).as("__rho")
    df.select(groupCols.map(col) :+ bucket :+ rho: _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("__rho")).as("reg"))
  }

  /** The register file at rest: append partials as files, fold by MAX. */
  def saveHll(regs: DataFrame, path: String): Unit =
    regs.write.mode("overwrite").parquet(path)

  def appendHll(regs: DataFrame, path: String): Unit =
    regs.write.mode("append").parquet(path)

  def loadHll(spark: org.apache.spark.sql.SparkSession, path: String,
              groupCols: Seq[String] = Nil): DataFrame =
    spark.read.parquet(path)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("reg")).as("reg"))

  /** Distinct-count estimates from a folded register file, one row per
    * group: E = alpha_m·m² / (Σ 2^-reg + V) with V = m − non-empty
    * registers (empty registers contribute 2⁰ each), linear counting
    * m·ln(m/V) when E ≤ 2.5m and V > 0. Determinism note: Σ 2^-reg is
    * a sum of dyadic rationals spanning < 52 bits of exponent — EXACT
    * in double arithmetic, hence order-independent; everything after
    * it is a fixed scalar expression. The estimate is deterministic to
    * the bit, which is what lets a SQL oracle check a SKETCH. */
  def hllEstimate(regs: DataFrame, m: Int,
                  groupCols: Seq[String] = Nil): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(
      count(lit(1)).as("__nb"),
      sum(pow(lit(2.0), -col("reg"))).as("__sp"))
    val v = (lit(m.toLong) - col("__nb")).cast("double")
    val e = alpha * lit(m.toDouble) * lit(m.toDouble) / (col("__sp") + v)
    agg.withColumn("est", round(
        when(e <= lit(2.5) * lit(m.toDouble) && v > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / v)).otherwise(e), 6))
      .select(groupCols.map(col) :+ col("est"): _*)
  }

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

  /** FSCK — integrity audit of an at-rest CMS counter relation (the
    * FsckCore contract for this family). depth/width are the caller's
    * geometry, exactly as at build/append time. Checks:
    *
    *   - `readable` / `rows_nonempty` — the partial-copy guards;
    *   - `seed_domain` / `bucket_domain` — every cell inside the
    *     declared geometry (an out-of-domain cell means a partial was
    *     appended with DIFFERENT depth/width — the caller-contract
    *     violation that silently corrupts every estimate);
    *   - `counters_positive` — counters are sums of occurrence counts;
    *   - `mass_per_seed_equal` — the sketch's conservation law: each
    *     seed layer counts every item exactly once, so all depth layer
    *     sums are EQUAL (detail: the common sum = total items
    *     sketched). A lost parquet file drops random cells and breaks
    *     the equality — the one check that catches silent file loss in
    *     a sidecar-less layout. */
  def fsckCounters(spark: org.apache.spark.sql.SparkSession, path: String,
                   depth: Int, width: Int): DataFrame = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FsckCore.Check]
    FsckCore.readRelation(spark, path, "readable") match {
      case Left(c) => out += c
      case Right(raw) =>
        out += (("readable", true, 1L))
        val a = raw.agg(
          count(lit(1)),
          min(col("seed").cast("long")), max(col("seed").cast("long")),
          min(col("bucket").cast("long")), max(col("bucket").cast("long")),
          min(col("counter"))).head()
        val n = a.getLong(0)
        out += (("rows_nonempty", n > 0, 0L))
        if (n > 0) {
          out += (("seed_domain",
            a.getLong(1) >= 0L && a.getLong(2) < depth, depth.toLong))
          out += (("bucket_domain",
            a.getLong(3) >= 0L && a.getLong(4) < width, width.toLong))
          out += (("counters_positive", a.getLong(5) > 0L, 0L))
          val sums = raw.groupBy(col("seed"))
            .agg(sum(col("counter")).as("__s"))
            .agg(min(col("__s")), max(col("__s")),
              count(lit(1))).head()
          out += (("mass_per_seed_equal",
            sums.getLong(0) == sums.getLong(1) &&
              sums.getLong(2) == depth.toLong, sums.getLong(1)))
        }
    }
    FsckCore.toDf(spark, out.toSeq)
  }

  /** FSCK of an at-rest histogram: bin domain, positive counts, and
    * total mass (detail: sum of counts = rows sketched — the value a
    * base recompute predicts; a lost partial file shrinks it). */
  def fsckHistogram(spark: org.apache.spark.sql.SparkSession,
                    path: String, nBins: Int): DataFrame = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FsckCore.Check]
    FsckCore.readRelation(spark, path, "readable") match {
      case Left(c) => out += c
      case Right(raw) =>
        out += (("readable", true, 1L))
        val a = raw.agg(count(lit(1)), min(col("bin")), max(col("bin")),
          min(col("cnt")), sum(col("cnt"))).head()
        val n = a.getLong(0)
        out += (("rows_nonempty", n > 0, 0L))
        if (n > 0) {
          out += (("bin_domain",
            a.getLong(1) >= 0L && a.getLong(2) < nBins, nBins.toLong))
          out += (("counts_positive", a.getLong(3) > 0L, 0L))
          out += (("mass", a.getLong(4) > 0L, a.getLong(4)))
        }
    }
    FsckCore.toDf(spark, out.toSeq)
  }

  /** FSCK of an at-rest HLL register file: bucket domain, rho domain
    * (1..33 by the md5/bin construction), and per-group register
    * population ≤ m (detail of `groups`: distinct group count — what a
    * base recompute predicts). Register VALUES need no cross-check:
    * fold-by-max tolerates any duplication by design. */
  def fsckHll(spark: org.apache.spark.sql.SparkSession, path: String,
              m: Int, groupCols: Seq[String] = Nil): DataFrame = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FsckCore.Check]
    FsckCore.readRelation(spark, path, "readable") match {
      case Left(c) => out += c
      case Right(raw) =>
        out += (("readable", true, 1L))
        val a = raw.agg(count(lit(1)), min(col("bucket")),
          max(col("bucket")), min(col("reg")), max(col("reg"))).head()
        val n = a.getLong(0)
        out += (("rows_nonempty", n > 0, 0L))
        if (n > 0) {
          out += (("bucket_domain",
            a.getLong(1) >= 0L && a.getLong(2) < m, m.toLong))
          out += (("reg_domain",
            a.getLong(3) >= 1L && a.getLong(4) <= 33L, 33L))
          val g = raw.groupBy((groupCols :+ "bucket").map(col): _*)
            .agg(count(lit(1)))
            .agg(count(lit(1))).head().getLong(0)
          val groups =
            if (groupCols.isEmpty) 1L
            else raw.select(groupCols.map(col): _*).distinct().count()
          // distinct (group, bucket) cells cannot exceed groups × m
          out += (("registers_bounded", g <= groups * m, 0L))
          out += (("groups", groups > 0, groups))
        }
    }
    FsckCore.toDf(spark, out.toSeq)
  }
}
