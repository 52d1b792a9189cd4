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

  /** Leakage-free train/val/test split: assign the split at the
    * NEAR-DUPLICATE-CLUSTER level, not the document level, so two near
    * duplicates can never straddle the train/test boundary. A per-doc
    * hash split (trainValTest) is contamination-proof against pipeline
    * re-runs, but if doc A sits in train and its 97%-identical twin B in
    * test, the eval set is still leaked — the standard failure mode of
    * dedup-then-split pipelines that dedup at a threshold looser than
    * their notion of "same document".
    *
    * `pairs` is any near-dup pair relation (ngramJaccardPairs, MinHash
    * candidates, embedding near-dup — whatever defines "too similar to
    * separate"). Pairs → connected components (Dedup.connectedComponents,
    * the O(log diameter) pointer-jumping loop); every document's bucket
    * coin is the md5 hash of its component representative (min id), with
    * singletons their own representative — so an entire duplicate
    * cluster lands in one split, and documents untouched by any pair
    * split exactly as trainValTest would split their rep (= their id).
    *
    * Scale: the components loop is the dominant cost and is the same
    * machinery q47 runs at corpus scale (checkpointed rounds, one
    * join+groupBy per round). The rep attachment is a single left join
    * keyed on the id — components output is one row per PAIRED doc, far
    * smaller than the corpus, and AQE broadcasts it when it fits.
    * Deterministic end-to-end: same pairs → same reps → same coins. */
  def groupAwareSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                      trainPct: Int = 80, valPct: Int = 10,
                      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(trainPct + valPct < 100, "need a non-empty test slice")
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("rep"))
    val withRep = df.join(comp, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("rep"), col(idCol)))
    val b = hashBucket(col("rep"), 100)
    withRep.withColumn("split",
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

  /** Rendezvous (highest-random-weight) routing: a key goes to the
    * node whose md5(node#key) weight is highest — consistent placement
    * with the minimal-disruption guarantee: removing a node relocates
    * ONLY that node's keys and adding one steals only the keys it now
    * wins (no global reshuffle), unlike mod-N, where resizing moves
    * (N-1)/N of all keys. The stable router for sharded index serving
    * and stateful stream partitioning.
    *
    * Pure expression: |nodes| md5 columns folded by one greatest()
    * over (weight, node) structs — scan speed, no shuffle, no UDF.
    * md5's fixed-width lowercase hex makes the lexicographic max the
    * numeric max; ties (2⁻¹²⁸) break to the larger node name. */
  def rendezvousRoute(keyCol: Column, nodes: Seq[String]): Column = {
    require(nodes.nonEmpty && nodes.distinct.size == nodes.size,
      "need a non-empty, duplicate-free node list")
    val cands = nodes.map(n => struct(
      md5(concat(lit(n), lit("#"), keyCol.cast("string"))).as("w"),
      lit(n).as("node")))
    val best =
      if (cands.size == 1) cands.head else greatest(cands: _*)
    best.getField("node")
  }

  /** Neyman-allocated stratified sampling: split a fixed eval budget
    * across strata proportional to `n_h · s_h` (stratum size × spread)
    * — the optimal-allocation rule that gives variable strata more of
    * the budget than proportional sampling would, the standard way to
    * build a small eval set that still resolves differences inside
    * heterogeneous sources.
    *
    * Determinism contract: the variability term is the exact integer
    * SPREAD max(size) − min(size) (a float stddev would expose
    * summation order to the cross-engine contract; callers with a
    * better exact variability signal pass it as `sizeCol`); the
    * allocation is largest-remainder integer math (floor(budget·W_h/ΣW)
    * + the leftovers to the largest remainders, ties to the smaller
    * stratum name) so every engine allocates identically; within a
    * stratum, rows are picked in (md5(stratum#id), id) coin order — the
    * established split-stability coin, so the pick is content-stable
    * under repartitioning and growing the budget only ADDS rows.
    * Degenerate all-zero spreads fall back to size-proportional
    * (W_h = n_h). Allocations are capped at n_h (a stratum cannot
    * overdraw).
    *
    * Scale: one |strata|-sized aggregate, the integer solve on the
    * driver over |strata| rows (metadata-sized by definition), and one
    * WindowGroupLimit-bounded rank filter per stratum — the capPerGroup
    * shuffle shape, O(strata × alloc) past the exchange.
    *
    * @return (original columns…) of the selected rows */
  def neymanSample(df: DataFrame, idCol: String, strataCol: String,
                   sizeCol: Column, budget: Long): DataFrame = {
    require(budget >= 0, "budget >= 0")
    // Strata are handled as STRINGS throughout (aggregate, allocation
    // lookup, coin, window) — an int-typed strata column works instead
    // of throwing ClassCastException on getString, and the coin string
    // is identical whatever the column's native type.
    val hcol = col(strataCol).cast("string")
    val stats = df.groupBy(hcol.as("__h"))
      .agg(count(lit(1)).as("__n"),
        (max(sizeCol) - min(sizeCol)).cast("long").as("__s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val allZero = stats.forall(_._3 == 0L)
    val weights = stats.map { case (h, n, s) =>
      (h, n, if (allZero) n else n * s)
    }
    val totalW = weights.map(_._3).sum
    val alloc: Map[String, Long] =
      if (totalW == 0L) weights.map { case (h, _, _) => h -> 0L }.toMap
      else {
        val base = weights.map { case (h, n, wt) =>
          (h, n, budget * wt / totalW, budget * wt % totalW)
        }
        val leftover = (budget - base.map(_._3).sum).toInt
        val bump = base.sortBy { case (h, _, _, rem) => (-rem, h) }
          .take(leftover).map(_._1).toSet
        base.map { case (h, n, a, _) =>
          h -> math.min(n, a + (if (bump(h)) 1L else 0L))
        }.toMap
      }
    val lut = alloc.toSeq.sortBy(_._1)
      .map { case (h, a) => (lit(h), lit(a)) }
    val allocCol = lut.foldLeft(lit(0L)) { case (acc, (h, a)) =>
      when(hcol === h, a).otherwise(acc)
    }
    val coin = md5(concat_ws("#", hcol, col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(hcol).orderBy(coin, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= allocCol)
      .drop("__rn")
  }

  /** Per-group document cap — the "domain cap" curation step: keep at
    * most `n` rows per group (source / domain / crawl host), chosen by
    * an explicit priority order instead of arrival order, so one
    * over-represented domain cannot dominate the mix no matter how
    * large it grows. Crawl pipelines apply exactly this with
    * group = registered domain and priority = quality score.
    *
    * Scale: this is deliberately a row_number window, NOT the q96
    * histogram trick — a cap needs a total order among ties, and Spark
    * 4 plans a partial WindowGroupLimit BEFORE the exchange for
    * rank-like filters, so each mapper forwards at most n rows per
    * group: the shuffle carries O(groups × n), never a whole domain
    * into one task. (PlanShapeSpec pins the WindowGroupLimit.)
    *
    * @param order priority columns, highest-priority first; callers
    *              must end with a unique tie-break for determinism */
  def capPerGroup(df: DataFrame, groupCol: Column, order: Seq[Column],
                  n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Exactly-n weighted sample WITHOUT replacement (Efraimidis–Spirakis
    * A-Res): every row draws priority u^(1/w) from its deterministic
    * id-hash coin u ∈ (0, 1) and the n highest priorities are the
    * sample — inclusion probability proportional to weight, sample size
    * exactly min(n, rows), no replacement. The complement of
    * weightedSample (Bernoulli: independent coins, binomial size): use
    * this when downstream needs a FIXED budget of rows.
    *
    * Scale: orderBy+limit compiles to TakeOrderedAndProject — a
    * per-partition top-n heap and one n×partitions merge; no full sort,
    * no shuffle of the corpus. Deterministic and partition-independent
    * like every sampler here: the coin is the id hash (salted "#r" for
    * independence from the split/sample coins), so reruns, appends and
    * repartitioning never change a surviving row's priority.
    *
    * @param weight  strictly positive weight expression
    * @param roundTo priorities are rounded before the cut (ln is the
    *                one libm call here — last-ulp portability, the
    *                bm25/cosine contract) */
  def weightedReservoir(df: DataFrame, idCol: String, weight: Column,
                        n: Int, roundTo: Int = 6): DataFrame = {
    require(n > 0, "sample size must be positive")
    // (bucket + 0.5)/1e6 keeps u strictly inside (0,1): u = 0 would
    // bottom the priority regardless of weight, u = 1 regardless of coin
    val u = (hashBucket(concat_ws("#", col(idCol), lit("r")), 1000000)
      .cast("double") + lit(0.5)) / 1000000.0
    // LOG-domain priority ln(u)/w — the same total order as the
    // textbook u^(1/w) (ln is monotone, ln(u) < 0, w > 0) but numerically
    // spread out: u^(1/w) itself collapses to 0.000000 at roundTo
    // decimals for small weights (w = 0.1 ⇒ exponent 10 zeroes every
    // u < 0.25), and the cut would then fall back to the id tie-break —
    // a deterministic id bias instead of a weighted sample.
    df.withColumn("__pri", round(log(u) / weight, roundTo))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(n)
  }

  /** Budget-constrained greedy selection: keep the highest-scoring rows
    * whose CUMULATIVE token count fits the budget — "the best N billion
    * tokens", the data-selection step when the training budget is fixed
    * in tokens, not documents. Semantically: order by (score DESC, id),
    * keep every prefix row whose running token total (inclusive) stays
    * ≤ budget.
    *
    * Scale: the naive form is one global window cumsum over the corpus —
    * a single task sorting everything. Instead, the prefix sum is taken
    * over the per-score HISTOGRAM (the q96 trick, globally): scores
    * arrive rounded, so the histogram is value-bounded; whole score
    * groups are kept or dropped by comparing their [before, before+g)
    * token interval against the budget, and only the ONE group straddling
    * the boundary pays a within-group window — sized by that tie group,
    * not the corpus. Rows shuffle once, by score. (A corpus where one
    * score value holds most rows degrades toward the global window; the
    * score's rounding granularity is the knob that prevents it.)
    *
    * @param scoreCol quality score, higher = better. Discretized
    *                 internally to `scoreDecimals` places — the
    *                 "value-bounded histogram" claim above is ENFORCED
    *                 here, not hoped for: a caller passing a raw
    *                 continuous score (every quality proxy is one) would
    *                 otherwise produce n distinct histogram rows and turn
    *                 the global window into a single-task sort of the
    *                 corpus (round-10 advice finding). Rows tying at the
    *                 chosen granularity rank by id, the documented
    *                 tie-break — pass pre-rounded scores (the oracle
    *                 queries do) for exact back-compat.
    * @param tokenCol per-row token count
    * @param scoreDecimals rounding granularity of the internal histogram;
    *                 bounds the window relation at range×10^d rows
    * @return the kept rows of df, original columns */
  def selectByTokenBudget(df: DataFrame, idCol: String, scoreCol: Column,
                          tokenCol: Column, budget: Long,
                          scoreDecimals: Int = 6): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    import org.apache.spark.sql.expressions.Window
    // base feeds the histogram AND both kept branches — persist so the
    // caller's lineage (often a full tokenization pass) runs once
    val base = CacheScope.register(
      df.withColumn("__score", round(scoreCol, scoreDecimals))
        .withColumn("__tok", tokenCol.cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hist = base.groupBy(col("__score")).agg(sum(col("__tok")).as("__g"))
    // running total over DISTINCT scores only (value-bounded relation);
    // constant partition key = same single-partition plan, declared as
    // intentional so the WindowExec warning flags only accidental ones
    val wBefore = Window.partitionBy(lit(0)).orderBy(col("__score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val h = hist.withColumn("__before",
      coalesce(sum(col("__g")).over(wBefore), lit(0L)))
    val joined = base.join(h, "__score")
    val whole = joined.filter(col("__before") + col("__g") <= budget)
    // exactly one score group straddles the budget; only it pays a
    // within-group ordered window (id order = the global tie order)
    val wIn = Window.partitionBy(col("__score")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // <= not <: when a group ends exactly at the budget, the next group
    // has __before == budget and must still be scanned — its leading
    // zero-token rows keep a running total of exactly `budget`, which the
    // inclusive-≤ contract admits
    val boundary = joined
      .filter(col("__before") <= budget &&
        col("__before") + col("__g") > budget)
      .withColumn("__cum", sum(col("__tok")).over(wIn))
      .filter(col("__before") + col("__cum") <= budget)
      .drop("__cum")
    whole.union(boundary).select(df.columns.map(col): _*)
  }

  /** Corpus mixing — the "data recipe" step of a training pipeline:
    * deterministically downsample each source so the kept rows follow
    * the target weight profile, maximizing output size subject to never
    * upsampling. With n_s rows per source and weights w_s, the largest
    * total the profile admits is T = min_s(n_s / w_s); the limiting
    * source is kept whole and every other keeps T·w_s/n_s of its rows
    * by salted id-hash coin (10⁻⁴ granularity). Sources absent from
    * `weights` are dropped.
    *
    * Cost at 100 TB: ONE tiny per-source count aggregate (partial-agg,
    * |sources| rows to the driver) to solve for T, then a scan-speed
    * filter — no shuffle of the corpus. Deterministic and
    * partition-independent like every sampler here; appending data
    * re-solves the fractions but each row's coin never changes.
    *
    * @return the kept rows with a `keep_frac` column recording the
    *         fraction applied to that row's source */
  def mixBySource(df: DataFrame, srcCol: String, idCol: String,
                  weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and strictly positive")
    val counts = df.filter(col(srcCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "no rows from any weighted source")
    val total = present.map { case (s, w) => counts(s) / w }.min
    // per-source keep threshold over the 10000-bucket coin space; floor
    // matches the oracle's CAST(floor(f * 10000) AS BIGINT) exactly.
    // Round to 9 decimals BEFORE the floor (oracle mirrors): for the
    // limiting source (n/w)·w/n is algebraically 1 but can evaluate to
    // 0.999…9 in doubles, and a raw floor would then drop ~1/10000 of
    // the very source the recipe keeps whole.
    val thr = present.map { case (s, w) =>
      s -> math.min(1.0, math.round(total * w / counts(s) * 1e9) / 1e9) }
    val thrCol = thr.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (s, f)) =>
        when(col(srcCol) === s, lit(f)).otherwise(acc) }
    // "mix" salt: coins independent of stratifiedSample/trainValTest
    val coin = hashBucket(
      concat_ws("#", lit("mix"), col(srcCol), col(idCol)), 10000)
    df.withColumn("keep_frac", thrCol)
      .filter(col("keep_frac").isNotNull &&
        coin < floor(col("keep_frac") * 10000).cast("long"))
  }

  /** Corpus mixing WITH bounded upsampling — the epoch-aware recipe:
    * high-value small sources may REPEAT up to `maxEpochs` times
    * (LLaMA/DoReMi-style mixes give Wikipedia/books several epochs while
    * web crawl gets a fraction of one), where [[mixBySource]] can only
    * downsample. With n_s rows per source and weights w_s, the largest
    * total the profile admits under the epoch cap is
    * T = min_s(n_s · maxEpochs / w_s); source s is assigned
    * e_s = T·w_s/n_s ∈ (0, maxEpochs] epochs — floor(e_s) full copies
    * of every row plus one more copy kept by salted id-hash coin with
    * probability frac(e_s). The limiting source repeats exactly
    * maxEpochs times; maxEpochs = 1 degenerates to [[mixBySource]]'s
    * never-upsample solve.
    *
    * Output rows carry an `epoch` column (0-based copy index) so
    * downstream packing/shuffling can keep copies apart. Cost at
    * 100 TB: one |sources|-row count aggregate, then a scan-speed
    * explode bounded by maxEpochs — no shuffle of the corpus.
    * Deterministic like every sampler here: a row's copies depend only
    * on (source, id).
    *
    * @return kept rows × copies, input columns + (epoch) */
  def mixWithEpochs(df: DataFrame, srcCol: String, idCol: String,
                    weights: Map[String, Double],
                    maxEpochs: Int): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and strictly positive")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val counts = df.filter(col(srcCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) =>
      counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "no rows from any weighted source")
    // n·E exact as a long, ONE double divide — the oracle's ns * E / wt
    val total = present.map { case (s, w) =>
      (counts(s) * maxEpochs).toDouble / w }.min
    // round-to-9 BEFORE floor/frac, the mixBySource contract: the
    // limiting source's T·w/n is algebraically maxEpochs but can
    // evaluate a hair under it in doubles
    val eps = present.map { case (s, w) => s -> math.min(
      maxEpochs.toDouble, math.round(total * w / counts(s) * 1e9) / 1e9) }
    val nFull = eps.map { case (s, e) => s -> math.floor(e).toLong }
    val thr = eps.map { case (s, e) =>
      s -> math.floor((e - math.floor(e)) * 10000).toLong }
    def lut(m: Map[String, Long]): Column = m.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (s, v)) =>
        when(col(srcCol) === s, lit(v)).otherwise(acc) }
    // "epoch" salt: the partial-copy coin is independent of the
    // mix/split/sample coins
    val coin = hashBucket(
      concat_ws("#", lit("epoch"), col(srcCol), col(idCol)), 10000)
    df.withColumn("__nf", lut(nFull)).withColumn("__ft", lut(thr))
      .filter(col("__nf").isNotNull)
      .withColumn("epoch", explode(sequence(lit(0L), col("__nf"))))
      .filter(col("epoch") < col("__nf") || coin < col("__ft"))
      .drop("__nf", "__ft")
  }

  /** Sequence packing for training-batch construction: documents are
    * concatenated in a deterministic order and cut into fixed-token-
    * budget bins — the concat-then-chunk step every LLM pre-training
    * pipeline runs between curation and tokenization. A doc's bin is
    * `floor(start_offset / budget)` of its position in the running
    * concatenation, so bins fill to the budget and a doc straddling a
    * boundary spills into the next bin (standard streaming semantics:
    * no bin exceeds budget + max_doc_tokens − 1; no driver-side bin
    * state, unlike true first-fit which is inherently sequential).
    *
    * Scale design: the corpus shards by id hash into `nShards`
    * independent packing streams (the parallelism unit — one window
    * partition each, so no global sort), and the running offset is one
    * cumulative-sum window per shard. Deterministic under reruns and
    * any input partitioning: shard and order depend only on ids.
    *
    * @param tokenCol expression giving the doc's token count
    * @param orderBy  optional curriculum ordering WITHIN each shard:
    *                 documents pack in this order (e.g. ascending
    *                 difficulty score for easy-first curriculum
    *                 training) instead of the id default; the id is
    *                 always appended as the final tie-break, so the
    *                 order stays total and rerun-deterministic.
    *                 Rounded score columns keep it engine-portable.
    * @return input columns + (shard, bin, offset_in_bin, n_tokens)
    */
  /** Temperature-scaled source mixing — the multilingual/multi-source
    * sampling rule of XLM (Conneau & Lample 2019) and mT5: keep
    * probabilities follow p_s ∝ n_s^alpha, so alpha = 1 is natural
    * sampling (everything kept), and alpha → 0 flattens toward uniform
    * across sources (large sources downsampled to the smallest's scale).
    * Delegates to [[mixBySource]] with weights n_s^alpha over ALL
    * sources present, inheriting its never-upsample total solve, its
    * 10⁻⁴-granular content-hash coins, and its one-tiny-aggregate +
    * scan-speed-filter cost shape.
    *
    * alpha = 0.5 (the common "square-root temperature") goes through
    * `sqrt`, which IEEE 754 requires to be correctly rounded in every
    * engine — so an SQL oracle reproduces the weights bit-for-bit;
    * `pow` carries no such guarantee (other alphas are spec-tested,
    * not oracle-anchored). */
  def mixByTemperature(df: DataFrame, srcCol: String, idCol: String,
                       alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty input")
    def weight(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else math.pow(n.toDouble, alpha)
    mixBySource(df, srcCol, idCol,
      counts.map { case (s, n) => s -> weight(n) })
  }

  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
                    budget: Long, nShards: Int,
                    orderBy: Seq[Column] = Seq.empty): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(orderBy :+ col(idCol).asc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("shard",
        hashBucket(concat_ws("#", lit("pack"), col(idCol)), nShards))
      .withColumn("__end", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__end") - col("n_tokens"))
      .withColumn("bin", floor(col("__start") / budget).cast("long"))
      .withColumn("offset_in_bin", (col("__start") % budget).cast("long"))
      .drop("__end", "__start")
  }

  /** Per-bin manifest of a packed corpus — the metadata a training
    * loader needs beside the token stream: sequence count, token count,
    * and the document-boundary spans. Packed bins hold tokens from many
    * documents; blockwise-causal attention must not let them attend
    * across boundaries, so the loader wants each bin's ordered
    * (doc, offset, length) list. Spans are canonicalized to an
    * "id:offset:len" ';'-join in offset order (the same string-join
    * canonical form the contract uses for arrays, q37) so the manifest
    * is flat, checker-hashable, and parquet-trivial.
    *
    * One groupBy (shard, bin) over [[packSequences]]' output — bins are
    * budget-bounded by construction, so the collect_list is bounded and
    * the aggregation skew-free.
    *
    * @return (shard, bin, n_seqs, bin_tokens, spans) — bin_tokens
    *         counts a straddling doc fully in its assigned bin
    */
  def packManifest(packed: DataFrame, idCol: String): DataFrame =
    packed.groupBy(col("shard"), col("bin")).agg(
      count(lit(1)).as("n_seqs"),
      sum(col("n_tokens")).as("bin_tokens"),
      array_join(transform(array_sort(collect_list(struct(
        col("offset_in_bin").as("o"), col(idCol).as("i"),
        col("n_tokens").as("n")))),
        s => concat_ws(":", s("i"), s("o"), s("n"))), ";").as("spans"))

  /** The packed corpus AT REST — the terminal sink of the training
    * pipeline: sequence rows under shard-partitioned directories (a
    * loader rank reads ONLY its shard's directory — partition pruning
    * is the distribution mechanism) plus the [[packManifest]] relation
    * beside them. The shard value is duplicated into a partition alias
    * column rather than partitioned directly, so the data files keep
    * the typed `shard` column (partition-column type inference would
    * silently narrow long → int on read-back).
    *
    * Layout: parquet files under path/data/shard_part=K/ and
    * path/manifest/ — same parquet-plus-relations shape as the
    * vector/postings index layouts (VectorIndex.save,
    * TextSearch.buildIndex). */
  def writeShards(packed: DataFrame, idCol: String, path: String): Unit = {
    packed.withColumn("shard_part", col("shard"))
      // one writer task per shard -> each shard directory is one file,
      // the artifact shape a training loader wants (and the r13
      // geometry rule: otherwise tasks x shards tiny files). Shards
      // are sized by the packer, so per-task write volume is bounded.
      .repartition(col("shard_part"))
      // the repartition hash-scatters rows, destroying the (bin,
      // offset_in_bin) order packSequences produced — restore it so a
      // loader can stream each shard file sequentially without a sort
      // (the manifest's spans assume span order within a bin). Cheap:
      // one in-memory sort per shard, and shards are budget-bounded by
      // the packer. (ADVICE r13)
      .sortWithinPartitions(col("bin"), col("offset_in_bin"))
      .write.partitionBy("shard_part").mode("overwrite")
      .option("maxRecordsPerFile", WriteGeometry.MaxFileRows)
      .parquet(s"$path/data")
    packManifest(packed, idCol)
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Sequence rows of a saved shard layout (all shards, or one rank's
    * via `shard = Some(k)` — pruned to that directory at plan time). */
  def readShards(spark: org.apache.spark.sql.SparkSession, path: String,
                 shard: Option[Long] = None): DataFrame = {
    val all = spark.read.parquet(s"$path/data")
    shard.fold(all)(k => all.filter(col("shard_part") === k))
      .drop("shard_part")
  }

  /** The saved manifest relation of [[writeShards]]' layout. */
  def readShardManifest(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame =
    spark.read.parquet(s"$path/manifest")

  /** FSCK of a packed-shard layout (the FsckCore contract) — the audit
    * a training run performs before a thousand loader ranks trust
    * their shard directories:
    *
    *   - `manifest_readable` / `data_readable` — either relation
    *     missing (the partial-copy case) is a failing row, not a
    *     crash; data missing short-circuits the cross-checks;
    *   - `ids_unique` — a sequence packed twice would be trained on
    *     twice;
    *   - `shard_domain_match` — the data's distinct shard set equals
    *     the manifest's (detail: shard count; a shard dir lost in a
    *     copy strands its manifest spans — the loader rank would read
    *     an empty dir and silently train on nothing);
    *   - `rows_match_manifest` — data rows == Σ manifest n_seqs
    *     (detail: the row count; catches partial shard-file loss);
    *   - `write_eras` — the WriteGeometry ledger over `shard_part=`
    *     dirs (1 after a build at any scale). */
  def fsckShards(spark: org.apache.spark.sql.SparkSession,
                 path: String, idCol: String = "doc_id"): DataFrame = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FsckCore.Check]
    val man = FsckCore.readRelation(spark, s"$path/manifest",
      "manifest_readable")
    out += man.fold(identity, _ => ("manifest_readable", true, 1L))
    FsckCore.readRelation(spark, s"$path/data", "data_readable") match {
      case Left(c) => out += c
      case Right(data) =>
        out += (("data_readable", true, 1L))
        val a = data.agg(count(lit(1)),
          countDistinct(col(idCol))).head()
        val n = a.getLong(0)
        out += (("rows_nonempty", n > 0, n))
        if (n > 0) {
          out += (("ids_unique", n == a.getLong(1), 0L))
          man.foreach { m =>
            val dShards = data.select(col("shard")).distinct()
            val mShards = m.select(col("shard")).distinct()
            val stray = dShards.join(mShards, Seq("shard"), "left_anti")
              .count() +
              mShards.join(dShards, Seq("shard"), "left_anti").count()
            out += (("shard_domain_match", stray == 0L, mShards.count()))
            val mRows = m.agg(sum(col("n_seqs"))).head().getLong(0)
            out += (("rows_match_manifest", mRows == n, n))
          }
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val perShard = data.groupBy(col("shard")).count().collect()
            .map(r => r.get(0).toString -> r.getLong(1)).toMap
          out += (("write_eras", true, WriteGeometry.writeEras(fs,
            new org.apache.hadoop.fs.Path(s"$path/data"), "shard_part",
            perShard).toLong))
        }
    }
    FsckCore.toDf(spark, out.toSeq)
  }
}
