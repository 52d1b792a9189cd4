package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north-star surface,
  * SURVEY.md §2B): quality scoring, language ID, tokenization stats,
  * document fingerprinting. All pure builtin expressions — fully codegen'd,
  * no UDFs, trivially parallel (per-row map, no shuffle until the caller
  * aggregates), so they stream over 100 TB of documents at scan speed.
  */
object TextAnalysis {

  /** Stopword list used by the quality score (deliberately tiny and
    * multilingual; deterministic across engines). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "and", "of", "in", "to", "is",
    "el", "la", "de", "los", "que",
    "le", "les", "et", "un", "une",
    "der", "die", "und", "das")

  private val punctClass = "[.,!?;:]"

  /** Per-document quality features: char count, token count, punctuation
    * ratio, stopword ratio. Length-0 guards via greatest(_, 1). */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val toks = split(lower(text), " ")
    val nTok = size(toks)
    val nPunct = length(text) - length(regexp_replace(text, punctClass, ""))
    val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
    docs
      .withColumn("n_chars", length(text).cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("punct_ratio",
        round(nPunct / greatest(length(text), lit(1)), 6))
      .withColumn("stop_ratio", round(nStop / greatest(nTok, lit(1)), 6))
  }

  /** Per-source calibration of a quality score: each document's score
    * becomes its percentile WITHIN its source (percent_rank: (rank-1)/
    * (n-1), ties share a rank, a 1-row source scores 0.0). Quality
    * classifiers are miscalibrated across domains — the same raw score
    * means different things on web crawl vs reference text — so
    * curation thresholds ("keep the top 30%") are applied per source on
    * the rank-normalized score; this is the distributed form of that
    * calibration step.
    *
    * Scale design: NOT a per-row window (a window partitioned by source
    * sorts whole sources in single tasks — the q89 lesson at 100 TB).
    * percent_rank with tie sharing is a function of the per-(source,
    * score) HISTOGRAM: rank(s) - 1 = #rows below s. So: one groupBy to
    * value-cardinality-sized counts, a running sum over that histogram
    * (window over distinct values, not rows), and a join back that AQE
    * broadcasts in the typical case. Rows shuffle once, by (source,
    * score); nothing ever sorts a whole source in one task.
    *
    * @param scoreCol raw quality score (pre-rounded scores keep the
    *                 histogram small); ties share a percentile, so the
    *                 result is deterministic with no id tie-break */
  def calibrateQuality(docs: DataFrame, idCol: String, scoreCol: Column,
                       sourceCol: Column, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.withColumn("__src", sourceCol)
      .withColumn("__score", scoreCol)
    val hist = base.groupBy(col("__src"), col("__score"))
      .agg(count(lit(1)).as("__c"))
    // RANGE running frame over the histogram: one row per distinct
    // (source, score), so the cumulative sum is over values, not rows
    val running = Window.partitionBy(col("__src")).orderBy(col("__score"))
    val whole = Window.partitionBy(col("__src"))
    val pct = hist
      .withColumn("__below", sum(col("__c")).over(running) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(whole))
      .withColumn("quality_pct", round(when(col("__n") > 1,
        col("__below") / (col("__n") - lit(1))).otherwise(lit(0.0)),
        roundTo))
      .select(col("__src"), col("__score"), col("quality_pct"))
    base.join(pct, Seq("__src", "__score")).drop("__src", "__score")
  }

  /** Unigram language-model scoring — the perplexity-style quality
    * filter: the corpus itself is the model (p(tok) = corpus count /
    * corpus tokens) and each document scores its mean per-token
    * surprisal -ln p(tok) in nats. Gibberish and off-distribution text
    * score high, boilerplate scores low; CCNet/Gopher-style pipelines
    * threshold exactly this signal (theirs from a trained KenLM — this
    * operator is the distributed SCORING shape; swap the count model
    * for trained weights by substituting the vocab relation).
    *
    * Scale: one token-count shuffle builds the model (map-side
    * combined, vocabulary-sized output), the model joins back to the
    * token stream by token (AQE broadcasts a bounded vocabulary), and
    * one per-doc shuffle takes the mean. The corpus total rides as a
    * 1-row broadcast. No sort, no window, no driver state.
    *
    * @param roundTo decimals the mean is rounded to AFTER aggregation
    *                (addend order differs between engines — the q35/q65
    *                contract) */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                       roundTo: Int = 6): DataFrame =
    unigramSurprisalWith(docs, idCol, textCol,
      lmCounts(docs, textCol), roundTo)

  /** The unigram count model as a RELATION (token, cnt) — what
    * [[unigramSurprisal]] fits from its own corpus, exposed so a model
    * can be fitted once, persisted ([[saveLm]]), grown incrementally
    * ([[appendLm]]) and served against any corpus
    * ([[unigramSurprisalWith]]). One map-side-combined count shuffle,
    * vocabulary-sized output. */
  def lmCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))

  /** The count model AT REST — the KenLM-artifact cadence on the same
    * contract as the CMS at rest (Sketches.saveCounters): `appendLm`
    * writes a new batch's PARTIAL counts as new files with no
    * read-modify-write (count mergeability is the ingest path), and
    * `loadLm` folds all partials to one row per token. Each crawl
    * batch/day/shard appends its own vocab-sized relation; a reader
    * pays one reduce over |batches| × vocab rows. */
  def saveLm(counts: DataFrame, path: String): Unit =
    counts.write.mode("overwrite").parquet(path)

  def appendLm(counts: DataFrame, path: String): Unit =
    counts.write.mode("append").parquet(path)

  def loadLm(spark: org.apache.spark.sql.SparkSession,
             path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))

  /** FSCK — integrity audit of an at-rest unigram count model (the
    * FsckCore contract). `rows_nonempty`'s detail is the folded
    * VOCABULARY size and `mass`'s detail the total token count — both
    * values a base-corpus recompute predicts (the q170 oracle
    * discipline); a lost partial file shrinks the mass. */
  def fsckLm(spark: org.apache.spark.sql.SparkSession,
             path: String): DataFrame = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FsckCore.Check]
    FsckCore.readRelation(spark, path, "readable") match {
      case Left(c) => out += c
      case Right(raw) =>
        out += (("readable", true, 1L))
        val a = raw.agg(count(lit(1)),
          sum(when(col("token").isNull, 1L).otherwise(0L)),
          min(col("cnt")), sum(col("cnt")),
          countDistinct(col("token"))).head()
        val n = a.getLong(0)
        out += (("rows_nonempty", n > 0, if (n > 0) a.getLong(4) else 0L))
        if (n > 0) {
          out += (("tokens_nonnull", a.getLong(1) == 0L, 0L))
          out += (("counts_positive", a.getLong(2) > 0L, 0L))
          out += (("mass", a.getLong(3) > 0L, a.getLong(3)))
        }
    }
    FsckCore.toDf(spark, out.toSeq)
  }

  /** Score documents against an EXTERNAL unigram model relation
    * (token, cnt) — [[unigramSurprisal]]'s scoring shape with the model
    * decoupled from the corpus: fit on a reference corpus (or load a
    * saved/appended model), score any stream. Tokens absent from the
    * model are DROPPED by the inner join (n_tokens counts in-model
    * tokens only); callers wanting smoothing union a floor count into
    * the model first. */
  def unigramSurprisalWith(docs: DataFrame, idCol: String,
                           textCol: String, model: DataFrame,
                           roundTo: Int = 6): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("__tok"))
    val vocab = model.select(col("token").as("__tok"),
      col("cnt").as("__c"))
    val total = vocab.agg(sum(col("__c")).as("__tot"))
    toks.join(vocab, "__tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("__c").cast("double") /
          col("__tot").cast("double"))), roundTo).as("mean_surprisal"))
  }

  /** Bigram language-model scoring with Laplace smoothing — one order up
    * from unigramSurprisal: each document's mean per-bigram surprisal
    * -ln p(tok | prev), p = (c(prev,tok) + 1) / (c(prev·) + V), where
    * c(prev·) counts prev as a bigram PREFIX (non-final positions) and V
    * is the unigram vocabulary size. Context-sensitive gibberish that
    * unigram stats miss (right words, wrong order) scores high here —
    * the next step toward the KenLM-style perplexity filter, same
    * distributed shape.
    *
    * Scale: bigrams are materialized at the ARRAY level (a transform
    * over the token array inside the scan stage — no join, no window,
    * no per-doc sort), then one explode feeds three bounded aggregates:
    * the bigram-vocab count shuffle, the prefix-vocab count shuffle,
    * and a 1-row V. The stream joins the two models by key (AQE
    * broadcasts bounded vocabularies) and one per-doc shuffle takes the
    * mean. Documents with fewer than two tokens have no bigrams and are
    * absent from the output by contract.
    *
    * @param roundTo decimals the mean is rounded to AFTER aggregation
    *                (addend order differs between engines) */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                      roundTo: Int = 6): DataFrame = {
    // materialize the token array in its own projection: inlined into
    // the transform lambda, split() re-executes per element_at PER
    // ELEMENT (no CSE inside Generate) — O(tokens²) per document,
    // measured 6.3 s vs 0.4 s at sf0.1. CollapseProject keeps the alias
    // because it is referenced more than once.
    val withToks = docs
      .select(col(idCol), split(lower(col(textCol)), " ").as("__t"))
    val t = col("__t")
    // tokens contain no space (split contract), so "prev cur" is an
    // injective bigram key both engines build identically
    val bgArr = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    val bg = withToks.select(col(idCol), explode(bgArr).as("__bg"))
    val c2 = bg.groupBy(col("__bg")).agg(count(lit(1)).as("__c2"))
    val c1 = bg.select(substring_index(col("__bg"), " ", 1).as("__p"))
      .groupBy(col("__p")).agg(count(lit(1)).as("__c1"))
    val v = docs.select(explode(split(lower(col(textCol)), " ")).as("__tok"))
      .agg(count_distinct(col("__tok")).as("__v"))
    bg.join(c2, "__bg")
      .withColumn("__p", substring_index(col("__bg"), " ", 1))
      .join(c1, "__p")
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("__c2") + lit(1.0)) /
          (col("__c1") + col("__v")))), roundTo).as("mean_surprisal"))
  }

  /** Token-distribution drift between two corpus slices — the dataset
    * monitoring primitive: which tokens are over-represented in slice A
    * vs slice B? Each side's unigram distribution is Laplace-smoothed
    * over the UNION vocabulary (p(t) = (c+1)/(total+|V|), so a token
    * absent from one side still gets a finite ratio) and tokens rank by
    * |ln(p_a/p_b)| — the top movers are the drift report. Run it crawl
    * batch vs standing corpus (ingest monitoring), train split vs eval
    * split (leakage/skew), or source vs source (mixing diagnostics).
    *
    * Scale: two token-count shuffles (map-side combined, vocab-sized
    * outputs), one vocab-sized full outer join, three scalars in one
    * broadcast row, and a top-N over the vocabulary. The corpus is
    * scanned once per side; no row-sized relation survives the counts.
    *
    * Determinism: the log ratio is rounded to `roundTo` BEFORE the
    * rank-order and the top-N cut (the q65 boundary-set contract), ties
    * break by token ascending. */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String,
                 topN: Int = 50, roundTo: Int = 6): DataFrame = {
    def counts(df: DataFrame, out: String) = df
      .select(explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as(out))
    val u = counts(a, "__ca").join(counts(b, "__cb"), Seq("token"),
        "full_outer")
      .select(col("token"),
        coalesce(col("__ca"), lit(0L)).as("count_a"),
        coalesce(col("__cb"), lit(0L)).as("count_b"))
    val scalars = u.agg(sum(col("count_a")).as("__na"),
      sum(col("count_b")).as("__nb"), count(lit(1)).as("__v"))
    u.crossJoin(broadcast(scalars))
      // + 0.0 normalizes IEEE -0.0 to +0.0 (Spark's BigDecimal round
      // can't emit -0 but other engines' can — the rendered "-0" vs "0"
      // would break cross-engine comparison of a no-drift token)
      .withColumn("llr", round(
        log(((col("count_a") + lit(1.0)) / (col("__na") + col("__v"))) /
            ((col("count_b") + lit(1.0)) / (col("__nb") + col("__v")))),
        roundTo) + lit(0.0))
      .select(col("token"), col("count_a"), col("count_b"), col("llr"))
      .orderBy(abs(col("llr")).desc, col("token"))
      .limit(topN)
  }

  /** DSIR importance weighting — data selection via importance
    * resampling (Xie et al. 2023): score every raw document by how much
    * more likely its text is under the TARGET distribution than under
    * the RAW distribution, using hashed-unigram bag-of-words models.
    * Selecting the top-weighted documents (or resampling proportional
    * to exp(weight)) shifts the corpus toward the target domain — the
    * published cheap alternative to a trained domain classifier.
    *
    * Model: tokens hash into `nBuckets` buckets (Sampling.hashBucket —
    * the engine-portable md5 bucket every sampler shares), each side's
    * bucket distribution is Laplace-smoothed (p_b = (c_b + 1) /
    * (total + nBuckets)), and a document's log-weight is
    * Σ_tokens ln p_target(b(tok)) − ln p_raw(b(tok)).
    *
    * Scale: two bucket-count shuffles (map-side combined, nBuckets-sized
    * outputs), one nBuckets-sized full outer join, two scalars in one
    * broadcast row, then the raw token stream joins the BROADCAST
    * per-bucket log-ratio table and one per-doc shuffle sums. The raw
    * corpus is scanned twice (model + scoring), the target once; no
    * row-sized relation survives the counts and nothing driver-side.
    *
    * @param target  the domain sample to steer toward (its size can be
    *                tiny — that is DSIR's point)
    * @param roundTo decimals the per-doc SUM is rounded to after
    *                aggregation (addend order differs between engines)
    * @return (idCol, n_tokens, dsir_logweight) for every raw doc */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, nBuckets: Int = 1024,
                  roundTo: Int = 6): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    def buckets(df: DataFrame) = df
      .select(col(idCol), explode(split(lower(col(textCol)), " "))
        .as("__tok"))
      .select(col(idCol),
        Sampling.hashBucket(col("__tok"), nBuckets).as("__b"))
    val rawToks = buckets(raw)
    val rc = rawToks.groupBy(col("__b")).agg(count(lit(1)).as("__cr"))
    val tc = buckets(target).groupBy(col("__b"))
      .agg(count(lit(1)).as("__ct"))
    val m = rc.join(tc, Seq("__b"), "full_outer")
      .select(col("__b"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
    val s = m.agg(sum(col("__cr")).as("__nr"), sum(col("__ct")).as("__nt"))
    val w = m.crossJoin(broadcast(s))
      .select(col("__b"),
        (log((col("__ct") + lit(1.0)) / (col("__nt") + lit(nBuckets))) -
         log((col("__cr") + lit(1.0)) / (col("__nr") + lit(nBuckets))))
          .as("__llr"))
    rawToks.join(broadcast(w), "__b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__llr")), roundTo).as("dsir_logweight"))
  }

  /** Vocabulary coverage analysis — the tokenizer-planning primitive:
    * the top `vocabSize` corpus tokens by frequency, each with its rank
    * and the CUMULATIVE fraction of all corpus tokens a vocabulary cut
    * at that rank would cover. The complement of the last row's
    * coverage is the OOV rate a `vocabSize`-entry word-level tokenizer
    * would pay; the curve's shape says whether growing the vocabulary
    * is still buying coverage.
    *
    * Scale: one token-count shuffle (map-side combined, vocab-sized),
    * a top-N cut, and a rank window over the RETURNED vocabSize rows
    * only — single-partition by contract, same bounded-shortlist
    * argument as rrfFuse (the heavy lifting is the count shuffle; this
    * is a driver-sized report). Ordering ties break by token ascending,
    * so ranks are engine-deterministic. */
  def vocabCoverage(docs: DataFrame, textCol: String, vocabSize: Int,
                    roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(vocabSize >= 1, "vocabSize >= 1")
    val counts = docs
      .select(explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("count"))
    val total = counts.agg(sum(col("count")).as("__tot"))
    val order = Seq(col("count").desc, col("token").asc)
    // vocabSize-bounded relation; constant partition key declares the
    // single-partition window intentional (keeps WindowExec's warning
    // channel clean for accidental corpus-sized ones)
    val w = Window.partitionBy(lit(0)).orderBy(order: _*)
    counts.orderBy(order: _*).limit(vocabSize)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_coverage", round(
        sum(col("count")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") / col("__tot"), roundTo))
      .select(col("rank"), col("token"), col("count"),
        col("cum_coverage"))
      .orderBy(col("rank"))
  }

  /** Deterministic rule-based language ID (n-gram/marker heuristic).
    * Ordered rules over distinctive scripts/words; defaults to "en".
    * Not a real classifier — the operator contract is determinism and
    * scan-speed execution; swap the rule table for a trained model's
    * decision rules in production. */
  def langId(docs: DataFrame, textCol: String = "text"): Column = {
    val padded = concat(lit(" "), col(textCol), lit(" "))
    def hasWord(w: String): Column = padded.contains(s" $w ")
    when(col(textCol).rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(hasWord("der") || hasWord("und") || hasWord("das") ||
        col(textCol).contains("ü"), "de")
      .when(col(textCol).contains("ñ") || hasWord("el") || hasWord("los") ||
        hasWord("es"), "es")
      .when(hasWord("le") || hasWord("les") || hasWord("et") ||
        col(textCol).contains("è"), "fr")
      .otherwise("en")
  }

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric-non-space symbols. Same regex semantics in Java
    * (Spark) and RE2 (DuckDB) — no \s, \w shorthand (their definitions
    * differ at the unicode edges). */
  val tokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def tokenCount(textCol: Column): Column =
    regexp_count(textCol, lit(tokenPattern)).cast("long")

  /** PII scrub patterns: (regex, typed placeholder), applied in order —
    * emails before IPs so an address's dotted domain can't half-match the
    * IP pattern. Deliberately RE2-compatible ASCII (no \b, \w, \s, no
    * lookaround): Java regex (Spark) and RE2 (DuckDB/Go tooling) scrub
    * byte-identically, so the oracle can verify the transform and a
    * downstream engine reproduces it. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}" -> "<PHONE>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>")

  /** Replace email / phone-shaped / IPv4-shaped tokens with typed
    * placeholders — the standard pre-training privacy pass. A pure
    * regexp_replace chain: scan-speed, codegen, no UDF, no shuffle. */
  def scrubPii(textCol: Column): Column =
    piiPatterns.foldLeft(textCol) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }

  /** PII exposure report — the measurement face of scrubPii: per
    * pattern type, how many documents contain at least one match and
    * how many matches there are in total. Privacy/compliance reviews
    * read this BEFORE deciding to scrub; at 100 TB it is one
    * scan-speed projection (regexp_count per pattern, codegen, no UDF)
    * into a single 1-row aggregate, exploded to one row per type.
    *
    * Pattern i is counted on text with patterns < i already replaced —
    * exactly the text scrubPii's fold would hand pattern i — so the
    * report measures what scrubbing would actually fire on. (An email
    * whose domain embeds an IP, like u@1.2.3.4.com, is consumed whole by
    * the EMAIL replace and must not be double-counted as an IP.)
    *
    * @return (pii_type, n_docs, n_matches), one row per pattern */
  def piiStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val staged = piiPatterns.zipWithIndex
      .foldLeft(docs.select(col(textCol).as("__t0"))) {
        case (df, ((p, r), i)) =>
          df.withColumn(s"__c$i", regexp_count(col(s"__t$i"), lit(p)))
            .withColumn(s"__t${i + 1}", regexp_replace(col(s"__t$i"), p, r))
      }
    val counted = staged.select(piiPatterns.indices.map(i => col(s"__c$i")): _*)
    val aggs = piiPatterns.zipWithIndex.flatMap { case (_, i) => Seq(
      count(when(col(s"__c$i") > 0, 1)).as(s"__d$i"),
      sum(col(s"__c$i")).cast("long").as(s"__m$i")) }
    val rows = piiPatterns.zipWithIndex.map { case ((_, r), i) =>
      struct(lit(r).as("pii_type"), col(s"__d$i").as("n_docs"),
        col(s"__m$i").as("n_matches")) }
    counted.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.pii_type"), col("__r.n_docs"), col("__r.n_matches"))
  }

  /** Canonical-form document fingerprint: md5 of lowercased, trimmed,
    * whitespace-collapsed text. Equal fingerprints = exact near-duplicates
    * up to case/whitespace; grouping by fp is the scan-speed exact-dedup
    * key at 100 TB (hash-shuffle on fp, no pairwise compare). */
  def fingerprint(textCol: Column): Column =
    md5(lower(trim(regexp_replace(textCol, " +", " "))))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): per
    * document, the positions selected by sliding a window of `w`
    * consecutive token-k-gram hashes and keeping each window's minimum
    * (rightmost on equal hash) — LOCAL fingerprints with the guarantee
    * that any shared run of ≥ w+k-1 tokens yields at least one shared
    * fingerprint, which whole-document md5 (exact dedup) and shingle
    * sampling (MinHash) both lack. The partial-overlap / plagiarism-
    * span detector: join two corpora on fp to find copied passages
    * with positions.
    *
    * Hash = first 8 md5 hex chars of the k-gram as an integer
    * (engine-portable, the established md5-prefix family). The window
    * argmin is computed by exploding each position into the ≤ w windows
    * containing it and taking one min-struct per (doc, window) — a w×
    * bounded fan-out feeding ONE (doc, window) shuffle that spreads
    * arbitrarily large documents across tasks, where the per-doc
    * window-function formulation would sort each whole document in a
    * single task. Docs shorter than k tokens emit nothing; docs with
    * fewer than w k-grams form a single window.
    *
    * @return (idCol, pos, fp) distinct selected fingerprints with their
    *         k-gram positions, ordered by (id, pos) */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    val toks = col("__toks")
    val grams = transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => struct((i - 1).cast("long").as("pos"),
        concat_ws(" ",
          (0 until k).map(o => element_at(toks, i + o)): _*).as("g")))
    docs.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .filter(size(toks) >= k)
      .select(col(idCol),
        (size(toks) - (k - 1)).cast("long").as("__nkg"),
        explode(grams).as("__kg"))
      .select(col(idCol), col("__nkg"), col("__kg.pos").as("__pos"),
        conv(substring(md5(col("__kg.g")), 1, 8), 16, 10).cast("long")
          .as("__h"))
      .select(col(idCol), col("__pos"), col("__h"),
        explode(sequence(greatest(col("__pos") - (w - 1), lit(0L)),
          least(col("__pos"), greatest(col("__nkg") - w, lit(0L)))))
          .as("__j"))
      .groupBy(col(idCol), col("__j"))
      .agg(min(struct(col("__h").as("h"), (-col("__pos")).as("np")))
        .as("__m"))
      .select(col(idCol), (-col("__m.np")).as("pos"),
        col("__m.h").as("fp"))
      .distinct()
      .orderBy(col(idCol), col("pos"))
  }

  /** Partial-overlap (plagiarism-span) pair detection over winnowing
    * fingerprints: document pairs sharing >= `minShared` selected
    * fingerprints — the copied-passage detector. Because winnowing
    * guarantees any shared run of >= w+k-1 tokens yields a shared
    * fingerprint, this finds PARTIAL copies that whole-document
    * fingerprints miss and that Jaccard demotes when the copied span
    * is small relative to either document.
    *
    * Scale: the winnow relation is ~|tokens|/w per doc; the self-join
    * is blocked by fingerprint equality with a document-frequency cap
    * (`maxFpDf`, the q19 discipline) killing boilerplate fingerprints
    * that would otherwise pair everything — candidate pairs are
    * output-sized, never all-pairs. */
  def winnowOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4, minShared: Int = 2,
                         maxFpDf: Int = 1000): DataFrame = {
    require(minShared >= 1 && maxFpDf >= 2,
      "need minShared >= 1 and maxFpDf >= 2 (df-1 fps cannot pair)")
    val fps = winnow(docs, idCol, textCol, k, w)
      .select(col(idCol), col("fp")).distinct()
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxFpDf).select(col("fp"))
    val kept = fps.join(rare, Seq("fp"))
    kept.select(col("fp"), col(idCol).as("a"))
      .join(kept.select(col("fp"), col(idCol).as("b")), Seq("fp"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .orderBy(col("a"), col("b"))
  }

  /** Context-window chunking with overlap — the LLM-training prep step
    * that turns documents into model-sized pieces. Pure builtin
    * expressions (split → sequence of starts → posexplode → slice):
    * map-side fan-out, no shuffle, so it runs at scan speed over any
    * corpus size. Chunk starts advance by (chunkTokens - overlap); the
    * tail chunk may be short (never dropped).
    *
    * @return (original columns…, chunk_idx, chunk_text, n_chunk_tokens)
    */
  def chunk(docs: DataFrame, textCol: String,
            chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      "need chunkTokens > overlap >= 0")
    val stride = chunkTokens - overlap
    val toks = col("__toks")
    val starts = sequence(lit(1),
      greatest(size(toks) - overlap, lit(1)), lit(stride))
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .select(col("*"), posexplode(starts).as(Seq("chunk_idx", "__start")))
      .withColumn("__chunk", slice(toks, col("__start"), lit(chunkTokens)))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .withColumn("n_chunk_tokens", size(col("__chunk")).cast("long"))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .drop("__toks", "__start", "__chunk")
  }

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", appendix
    * A1.1): per-document fractions that catch degenerate repetition the
    * length/punctuation heuristics miss — boilerplate listings, keyword
    * stuffing, decoding loops.
    *
    *   - dup_word_frac: 1 − |distinct tokens| / |tokens| — map-side only
    *     (array_distinct inside the row);
    *   - top_bigram_frac: tokens covered by the single most frequent
    *     bigram = min(1, 2·max_count / n_tokens) — the ×2 counts both
    *     tokens of each occurrence, the cap keeps overlapping repeats
    *     ("a a a a") a fraction. Needs a per-(doc, bigram) count:
    *     explode → partial-aggregated groupBy keyed by (id, bigram) →
    *     per-id max. Both aggregates are doc-local keys, so the shuffle
    *     is combiner-friendly and skew-free at any corpus size; docs
    *     with <2 tokens get 0.
    *
    * The canonical Gopher use is a threshold filter (dup_word_frac > 0.3
    * or top_bigram_frac > 0.18 → drop) — left to the caller, the signals
    * compose with CorpusPipeline.prepare's quality stage. */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    val base = docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        round(lit(1.0) - size(array_distinct(toks)) /
          greatest(size(toks), lit(1)).cast("double"), 6)
          .as("dup_word_frac"))
    // one shared word-n-gram implementation (tokenization fixes land once)
    val bigrams = Dedup
      .shingles(docs.select(col(idCol), col(textCol)), idCol, textCol,
        n = 2, repartitionById = false)
      .groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("__maxbg"))
    base.join(bigrams, Seq(idCol), "left")
      .withColumn("top_bigram_frac",
        round(least(lit(1.0), coalesce(col("__maxbg") * 2.0, lit(0.0)) /
          greatest(col("n_tokens"), lit(1))), 6))
      .drop("__maxbg")
  }

  /** Benchmark decontamination: training documents sharing at least one
    * word n-gram with an evaluation set — the pre-training hygiene pass
    * that keeps test questions out of the training mix (n = 8..13 is the
    * published range; overlap at those lengths is essentially never
    * coincidence). Returns one row per CONTAMINATED training doc:
    * (idCol, n_eval_matches = distinct eval docs sharing a shingle).
    *
    * Scale shape: both sides shingle at scan speed (Dedup.shingles);
    * the join keys on the shingle string over distinct (id, shingle)
    * pairs. The eval side is benchmark-sized (thousands of docs) —
    * orders of magnitude below the train side — so AQE broadcasts it
    * from runtime stats and the 100 TB train stream never shuffles; no
    * hint pinned, the same regime logic as the dedup joins.
    *
    * @param maxShingleDf hot-key guard, same rationale and default as
    *        ngramJaccardPairs: a boilerplate n-gram (license header,
    *        template sentence) held by d_t train and d_e eval docs joins
    *        into d_t·d_e rows on ONE key; dropping shingles with
    *        train-side df > cap bounds every key at cap·|eval| rows.
    *        What's lost is ubiquitous n-grams — boilerplate, not
    *        contamination evidence (published decontamination setups
    *        drop the most common n-grams for the same reason), and a
    *        true mass leak still surfaces through its rarer shingles.
    *        No-op unless > maxShingleDf train docs share one n-gram —
    *        provably inert on the oracle fixtures.
    * @param bloomPrefilter prune the TRAIN side map-side with a Bloom
    *        filter built over the eval shingles before any train-side
    *        shuffle. The eval set is benchmark-sized while train is the
    *        100 TB corpus, so ~every train shingle is a non-match: the
    *        Bloom filter (a plan literal, ~10 bits/eval-shingle) drops
    *        them at scan speed and the two train-side exchanges
    *        (distinct + df-count) shrink from corpus-sized to
    *        matches-plus-false-positives. Provably lossless: Bloom has
    *        no false negatives, so every true overlap survives, and
    *        false positives are removed by the exact join; the df cap
    *        is unaffected because survival depends on the shingle value
    *        alone (a surviving shingle keeps ALL its (id, shingle)
    *        rows, so its train-side df is unchanged). Builds the filter
    *        eagerly (two small jobs over the eval side at call time);
    *        pass false to keep the transform fully lazy. */
  def decontaminate(train: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String = "text", n: Int = 8,
                    maxShingleDf: Int = 1000,
                    bloomPrefilter: Boolean = true): DataFrame = {
    require(maxShingleDf >= 1, "maxShingleDf must be >= 1")
    // 64-bit shingle hashes instead of the strings: ~10× smaller
    // distinct/join exchanges, same negligible-collision argument as
    // ngramJaccardPairs (≈ n_shingles²/2⁶⁴, deterministic)
    val e = Dedup.shingles(evalSet, idCol, textCol, n,
        repartitionById = false)
      .select(col(idCol).as("__eval_id"), xxhash64(col("shingle")).as("shingle"))
      .distinct()
    decontaminateCore(train, idCol, textCol, n, e, maxShingleDf,
      bloomPrefilter)
  }

  /** Shared scoring core: `e` is the (eval_id, shingle-hash) relation,
    * from a live eval frame ([[decontaminate]]) or the at-rest index
    * ([[decontaminateAgainstIndex]]). */
  private def decontaminateCore(train: DataFrame, idCol: String,
                                textCol: String, n: Int, e: DataFrame,
                                maxShingleDf: Int,
                                bloomPrefilter: Boolean): DataFrame = {
    val tRaw = Dedup.shingles(train, idCol, textCol, n,
        repartitionById = false)
      .select(col(idCol), xxhash64(col("shingle")).as("shingle"))
    val t = (if (bloomPrefilter) {
      // registered so CacheScope.collect callers can unpersist; read by
      // the count, the bloom aggregate, and the final join
      CacheScope.register(e.persist())
      val nEval = e.count()
      if (nEval == 0) tRaw.filter(lit(false))
      else tRaw.filter(mightContain(bloomOf(e, "shingle", nEval),
        col("shingle")))
    } else tRaw).distinct()
    val hot = t.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxShingleDf).select(col("shingle"))
    t.join(hot, Seq("shingle"), "left_anti")
      .join(e, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__eval_id")).as("n_eval_matches"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus: the
    * fraction of a document's distinct word n-grams absent from the
    * reference's n-gram set — the memorization/novelty metric
    * (McCoy et al.'s RAVEN novelty shape): novelty 0 means every
    * n-gram already exists in the reference (pure recombination or
    * leakage), 1 means fully novel text. The counting complement of
    * [[decontaminate]] (which counts MATCHED eval docs; this scores
    * the unmatched fraction).
    *
    * Scale: both sides reduce to distinct (id, hash) / distinct hash
    * relations; one left join + one per-doc aggregate. The reference
    * gram SET is vocab-like (distinct grams, not occurrences), and
    * the join is hash-keyed — AQE broadcasts a small reference. */
  def ngramNovelty(docs: DataFrame, ref: DataFrame, idCol: String,
                   textCol: String, n: Int = 4): DataFrame = {
    val d = Dedup.shingles(docs, idCol, textCol, n,
        repartitionById = false)
      .select(col(idCol), xxhash64(col("shingle")).as("__sh"))
      .distinct()
    val r = Dedup.shingles(ref, idCol, textCol, n,
        repartitionById = false)
      .select(xxhash64(col("shingle")).as("__sh"))
      .distinct()
      .withColumn("__seen", lit(1L))
    d.join(r, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel") / col("n_grams"), 6))
  }

  /** The decontamination index AT REST: the eval set's distinct
    * (eval_id, 8-gram-hash) relation persisted once and probed by every
    * training batch — the real cadence of decontamination (eval suites
    * are fixed artifacts; training corpora arrive in batches; the eval
    * side should never be re-shingled per batch). `appendEvalIndex`
    * adds a new suite's relation as new files (distinct-ness across
    * appends is NOT required for correctness: the countDistinct scoring
    * dedups eval ids, and duplicate (id, shingle) rows only cost their
    * own size). The probe path rebuilds the broadcast Bloom from the
    * at-rest relation — an eval-sized aggregate, paid once per probe
    * job, keeping the layout a plain relation instead of a serialized
    * filter format that an incremental append could not OR into.
    *
    * `n` (shingle width) is the caller's geometry contract, as with
    * every saved layout here (saveLm, saveCounters). */
  def buildEvalIndex(evalSet: DataFrame, idCol: String, textCol: String,
                     n: Int, path: String): Unit =
    Dedup.shingles(evalSet, idCol, textCol, n, repartitionById = false)
      .select(col(idCol).as("eval_id"),
        xxhash64(col("shingle")).as("shingle"))
      .distinct()
      .write.mode("overwrite").parquet(path)

  def appendEvalIndex(evalSet: DataFrame, idCol: String, textCol: String,
                      n: Int, path: String): Unit =
    Dedup.shingles(evalSet, idCol, textCol, n, repartitionById = false)
      .select(col(idCol).as("eval_id"),
        xxhash64(col("shingle")).as("shingle"))
      .distinct()
      .write.mode("append").parquet(path)

  /** FSCK of an at-rest decontamination eval index: null guards,
    * `rows_nonempty` detail = distinct eval ids covered (base-
    * predictable: suite docs with ≥ n tokens), and `duplicate_rows` —
    * cross-append duplicate (id, shingle) rows, LEGAL residue (the
    * countDistinct scoring dedups them) but the compaction-due signal
    * of this layout, reported with ok staying true. */
  def fsckEvalIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FsckCore.Check]
    FsckCore.readRelation(spark, path, "readable") match {
      case Left(c) => out += c
      case Right(raw) =>
        out += (("readable", true, 1L))
        val a = raw.agg(count(lit(1)),
          sum(when(col("eval_id").isNull || col("shingle").isNull, 1L)
            .otherwise(0L)),
          countDistinct(col("eval_id"))).head()
        val n = a.getLong(0)
        out += (("rows_nonempty", n > 0, if (n > 0) a.getLong(2) else 0L))
        if (n > 0) {
          out += (("cols_nonnull", a.getLong(1) == 0L, 0L))
          val dups = n - raw.distinct().count()
          out += (("duplicate_rows", true, dups))
        }
    }
    FsckCore.toDf(spark, out.toSeq)
  }

  /** Score a training batch against the at-rest eval index: identical
    * semantics (and oracle) to [[decontaminate]] over the union of
    * every built/appended eval suite. */
  def decontaminateAgainstIndex(train: DataFrame, idCol: String,
                                textCol: String, n: Int,
                                spark: org.apache.spark.sql.SparkSession,
                                path: String, maxShingleDf: Int = 1000,
                                bloomPrefilter: Boolean = true): DataFrame = {
    require(maxShingleDf >= 1, "maxShingleDf must be >= 1")
    val e = spark.read.parquet(path)
      .select(col("eval_id").as("__eval_id"), col("shingle"))
      .distinct()
    decontaminateCore(train, idCol, textCol, n, e, maxShingleDf,
      bloomPrefilter)
  }

  /** Serialized Bloom filter over a LongType column, sized at ~10
    * bits/item (≈1% fpp), capped at 2²⁶ bits (8 MiB — beyond that fpp
    * degrades gracefully rather than the literal bloating every plan
    * that embeds it). Runs a job (aggregation to one driver row). */
  private[graft] def bloomOf(df: DataFrame, colName: String,
                             estItems: Long): Array[Byte] = {
    import org.apache.spark.sql.GraftColumn
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = math.min(1L << 26, math.max(64L, estItems * 10L))
    df.select(GraftColumn(new BloomFilterAggregate(
        GraftColumn.expr(col(colName)),
        Literal(math.max(estItems, 1L)), Literal(numBits))
      .toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd Bloom membership predicate over a LongType column —
    * Spark's own runtime-filter expression, driven explicitly. */
  private[graft] def mightContain(bloom: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.GraftColumn
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    GraftColumn(BloomFilterMightContain(Literal(bloom, BinaryType),
      GraftColumn.expr(value)))
  }

  /** PMI collocation mining: the top-k adjacent word pairs by pointwise
    * mutual information, `ln((c12/Nb) / ((c1/N1)·(c2/N1)))` — the
    * classic phrase-vocabulary builder (Church & Hanks '90): pairs that
    * co-occur far above chance ("Hong Kong", "et al") get high PMI;
    * frequent-but-independent pairs sit near 0. `minCount` floors the
    * bigram count — PMI is famously noisy on rare pairs.
    *
    * Determinism contract: PMI is computed in one fixed-order float
    * expression `(c12·N1·N1) / (Nb·c1·c2)` from exact integer counts,
    * rounded to 6 dp BEFORE ranking, ties broken by (w1, w2).
    *
    * Scale: two vocabulary-sized aggregates (bigram + unigram counts),
    * two scalar totals, two vocab-keyed joins, one top-k — the corpus
    * is scanned once; nothing is ever per-document state. */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long = 5, k: Int = 20): DataFrame = {
    val toks = col("__t")
    val split0 = docs.select(split(col(textCol), " ").as("__t"))
    val uni = split0.select(explode(toks).as("w")).filter(col("w") =!= "")
    val c1 = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n1 = c1.agg(sum(col("c")).cast("double").as("__n1"))
    val bi = split0
      .filter(size(toks) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2")))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val nb = c12.agg(sum(col("n")).cast("double").as("__nb"))
    c12.filter(col("n") >= minCount)
      .join(c1.select(col("w").as("w1"), col("c").as("__c1")), Seq("w1"))
      .join(c1.select(col("w").as("w2"), col("c").as("__c2")), Seq("w2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(nb))
      .withColumn("pmi", round(log(
        (col("n").cast("double") * col("__n1") * col("__n1"))
          / (col("__nb") * col("__c1") * col("__c2"))), 6))
      .select(col("w1"), col("w2"), col("n"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Top-k tokens per group by tf-idf: tf = token count within the group,
    * idf = ln(n_groups / n_groups_containing_token). The corpus-level
    * term summary of a training-data mix ("what characterizes each
    * language/source slice").
    *
    * Scale shape: one shuffle to (group, token) for tf, one token-keyed
    * aggregate for document frequency, a single-row n_groups aggregate
    * broadcast-crossed, and a per-group top-k window over the (small)
    * distinct-token aggregate — the corpus itself is only read once. */
  /** TOKENIZER INDUCTION — the byte-pair-encoding merge loop (Sennrich
    * et al. 2016): "build the vocab from the corpus you just cleaned",
    * the last missing step of the training-data pipeline. Per round,
    * count adjacent symbol pairs over the word-TYPE table weighted by
    * type frequency (ONE vocab-sized shuffle — the corpus itself is
    * only read by the initial word-count aggregate), pick the argmax
    * merge on the driver (metadata-sized: one row), and apply it as a
    * string rewrite. Deterministic tie-break: highest count, then
    * smallest (left, right) pair lexicographically.
    *
    * Scale shape = the q92/q108 iterative-rounding contract: the
    * evolving state (the merge list) lives on the DRIVER, so the type
    * table is persisted ONCE and each round's plan is the fixed base
    * relation plus an N-deep codegen'd replace chain — no growing
    * data lineage, no per-round checkpoint.
    *
    * Representation: word types are lowercased alphabetic tokens
    * ([a-z]+ after whitespace split — the standard academic cleanup);
    * each becomes '··'-delimited symbols with a '_' end-of-word marker
    * ("low" → "··l··o··w··_··"). A merge of (l, r) is the literal
    * rewrite '·l··r·' → '·lr·': the leading/trailing single '·' anchor
    * full symbols (no prefix/suffix false matches — every symbol is
    * [a-z_]+, never containing '·'), and left-to-right non-overlapping
    * replace semantics (identical in Spark and DuckDB/standard SQL,
    * which is what makes the oracle expressible) are exactly BPE's
    * greedy merge order: in "l l l" only the first two merge. Sharing
    * one delimiter char between adjacent pairs would let the replace
    * CONSUME the boundary and skip back-to-back occurrences ("a b a b"
    * merging only once); the doubled delimiter leaves each occurrence
    * its own anchors.
    *
    * @return one row per merge round: (round, left_sym, right_sym,
    *         pair_count), in round order; stops early if the corpus
    *         runs out of pairs */
  def bpeMerges(docs: DataFrame, textCol: String,
                nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges >= 1")
    val spark = docs.sparkSession
    val types = CacheScope.register(bpeTypes(docs, textCol).persist())
    var merges = Vector.empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to nMerges if !exhausted) {
      // the sym column after all merges so far: a driver-built replace
      // chain, codegen'd — never a data-side join
      val symNow = merges.foldLeft(col("__sym")) {
        case (c, (_, l, rr, _)) =>
          replace(c, lit("·" + l + "··" + rr + "·"), lit("·" + l + rr + "·"))
      }
      val top = bpePairCounts(types.select(col("__cnt"),
          symNow.as("__sym")))
        .orderBy(col("__pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val t = top.head
        merges :+= ((r, t.getString(0), t.getString(1), t.getLong(2)))
      }
    }
    import spark.implicits._
    merges.toDF("round", "left_sym", "right_sym", "pair_count")
      .orderBy(col("round"))
  }

  /** Word-TYPE table for BPE: one row per distinct lowercased [a-z]+
    * token with its corpus frequency, symbolized as '··'-delimited
    * characters + the '_' end-of-word marker (see [[bpeMerges]]). */
  private def bpeTypes(docs: DataFrame, textCol: String): DataFrame = docs
    .select(explode(split(lower(col(textCol)), "\\s+")).as("__w"))
    .filter(col("__w").rlike("^[a-z]+$"))
    .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
    .select(concat(lit("··"),
        regexp_replace(col("__w"), "(.)", "$1··"),
        lit("_··")).as("__sym"),
      col("__cnt"))

  /** Adjacent-symbol pair counts over a (__sym, __cnt) relation:
    * (l, r, __pc = Σ type-frequency-weighted occurrences). */
  private def bpePairCounts(types: DataFrame): DataFrame = {
    val toks = filter(split(col("__sym"), "··"), x => x =!= lit(""))
    // adjacent pairs (toks[i], toks[i+1]); transform's index is
    // 0-based over the length-(n-1) prefix slice, element_at 1-based
    val pairsArr = transform(slice(toks, lit(1), size(toks) - 1),
      (x, i) => struct(x.as("l"), element_at(toks, i + 2).as("r")))
    types.select(col("__cnt"), explode(pairsArr).as("__p"))
      .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
      .agg(sum(col("__cnt")).as("__pc"))
  }

  /** [[bpeMerges]] at production merge counts: identical output (same
    * counts, same greedy order, same tie-break — spec-pinned equal on
    * the Sennrich corpus), different round cost. The recount loop pays
    * one FULL pair recount per round (every type re-exploded through an
    * r-deep replace chain — fine for tens of merges, quadratic-ish
    * pain at a real 32k vocabulary). Here the loop maintains the two
    * relations BPE actually evolves, so a round's data cost is sized
    * by the types CONTAINING the merged pair, not the corpus:
    *
    *   - `state`  (__sym, __cnt): word types after all merges so far.
    *   - `pc`     (l, r, __pc):   current adjacent-pair counts.
    *
    * Per round: argmax over `pc` (vocab-sized, 1-row collect — same
    * contract as the recount loop); delta = pair counts of affected
    * types AFTER minus BEFORE the rewrite (exact longs, so the merged
    * argmax/tie-break ordering is bit-identical to a recount); fold the
    * delta into `pc` (outer-join merge, drop zeros); rewrite `state`.
    * Both relations are re-`localCheckpoint`ed eagerly each round —
    * the evolving state lives in vocab-sized RDD blocks, the lineage
    * never grows, and the previous round's blocks are unpersisted as
    * soon as the new ones are materialized (the q47/q108 iterative
    * contract). Driver state stays one (l, r) pair per round.
    *
    * Cost shape: 3 fixed jobs/round (argmax, pc merge, state rewrite).
    * The round's SHUFFLE terms are the affected types' pair delta plus
    * one pair-vocabulary-sized merge join; the state rewrite is a
    * map-only vocab scan. What's gone vs the recount: the per-round
    * corpus-wide pair re-explode (Σ word-lengths rows through a
    * shuffle) and the r-deep replace chain whose CPU grows with every
    * round — the terms that make 32k recount rounds intractable. At
    * toy scale the extra fixed jobs make delta SLOWER than recount;
    * the crossover is measured in BASELINE.md (r13). */
  def bpeMergesDelta(docs: DataFrame, textCol: String,
                     nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges >= 1")
    val spark = docs.sparkSession
    // eager vocab-sized checkpoint; superseded rounds are freed
    // immediately via the shared block extraction in CacheScope
    def ckpt(df: DataFrame): DataFrame =
      CacheScope.registerCheckpoint(df.localCheckpoint(true))
    def free(df: DataFrame): Unit =
      CacheScope.checkpointBlocksOf(df).foreach(_.unpersist(blocking = false))
    var state = ckpt(bpeTypes(docs, textCol))
    var pc = ckpt(bpePairCounts(state))
    var merges = Vector.empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to nMerges if !exhausted) {
      val top = pc.orderBy(col("__pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, n) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges :+= ((r, l, rr, n))
        val pat = "·" + l + "··" + rr + "·"
        val rewritten = replace(col("__sym"), lit(pat), lit("·" + l + rr + "·"))
        // only types containing the merged pair change ANY pair count;
        // their delta is exact: pairs(after) − pairs(before)
        val affected = state.filter(col("__sym").contains(pat))
        val delta = bpePairCounts(
            affected.select(rewritten.as("__sym"), col("__cnt")))
          .withColumnRenamed("__pc", "__add")
          .join(bpePairCounts(affected).withColumnRenamed("__pc", "__sub"),
            Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("__add"), lit(0L))
              - coalesce(col("__sub"), lit(0L))).as("__d"))
          .filter(col("__d") =!= 0L)
        val pc2 = ckpt(pc.join(delta, Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("__pc"), lit(0L))
              + coalesce(col("__d"), lit(0L))).as("__pc"))
          .filter(col("__pc") > 0L))
        val state2 = ckpt(state.select(
          when(col("__sym").contains(pat), rewritten)
            .otherwise(col("__sym")).as("__sym"),
          col("__cnt")))
        free(pc); free(state)
        pc = pc2; state = state2
      }
    }
    free(pc); free(state)
    import spark.implicits._
    merges.toDF("round", "left_sym", "right_sym", "pair_count")
      .orderBy(col("round"))
  }

  def tfidfTopTerms(docs: DataFrame, groupCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(groupCol), explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok"))
      .agg(count(lit(1)).as("df")) // tf rows are distinct (group, tok)
    val nGroups = docs.agg(
      countDistinct(col(groupCol)).cast("double").as("n_groups"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nGroups))
      .withColumn("score",
        round(col("tf") * log(col("n_groups") / col("df")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("tok"), col("score"), col("rn"))
  }
}
