package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — the product-analytics
  * operator (ClickHouse `windowFunnel`, Amplitude/Mixpanel funnels): how
  * many users performed step 1, then step 2 strictly after it within a
  * bounded gap, then step 3 after that, in order.
  *
  * Semantics: per user, t₁ = earliest step-1 event; tᵢ = earliest step-i
  * event with tᵢ₋₁ < ts ≤ tᵢ₋₁ + maxGap. "Earliest qualifying" (not "any
  * qualifying") makes the funnel deterministic and matches the strict
  * sequential mode — a user converts on their first opportunity or not at
  * all through that branch.
  *
  * Scale: ONE scan of the fact table (step-typed survivors persist),
  * then one aggregation per step, every one keyed on the user column —
  * |steps| user-keyed shuffles of progressively SHRINKING relations (the
  * reached set only loses users), plus a per-step equi-join against the
  * cached survivors that AQE plans from runtime sizes. No window, no
  * per-user sort, no collect of event data: a user's whole history never
  * meets a single task, only their per-step minima do.
  */
object Funnel {

  /** Cohort retention — the other pillar of product/event analytics
    * beside the funnel: group users by WHEN they first performed the
    * cohort event (signup week), then count how many are active 0, 1,
    * 2… weeks later — the retention triangle.
    *
    * Weeks are ABSOLUTE 7-day epoch buckets (floor(epoch_seconds /
    * 604800)), not calendar weeks: engine-portable integer arithmetic
    * with no week-start or locale semantics to disagree on.
    *
    * Scale: one user-keyed min-aggregate (the cohort), one
    * (user, week)-keyed distinct over the event stream (each active
    * week counted once however many events it holds), one user-keyed
    * equi-join, and a cohorts×offsets-sized final aggregate. No
    * windows, no sorts; a user's history never colocates.
    *
    * @return (cohort_wk, week_offset, n_users), offset ≥ 0 */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, cohortEvent: String): DataFrame = {
    val wk = floor(unix_timestamp(col(tsCol).cast("timestamp")) /
      lit(604800L)).cast("long")
    val base = events.select(col(userCol), wk.as("__wk"), col(typeCol))
    val cohorts = base.filter(col(typeCol) === cohortEvent)
      .groupBy(col(userCol)).agg(min(col("__wk")).as("cohort_wk"))
    val activity = base.select(col(userCol), col("__wk")).distinct()
    activity.join(cohorts, userCol)
      .filter(col("__wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"),
        (col("__wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user funnel anchors — the recurrence's full state instead of
    * its counts: one row per step-1 user with the anchor timestamp of
    * every step they reached (null beyond). This is what funnel LATENCY
    * analysis consumes (time-to-convert distributions between adjacent
    * steps); `funnel` is its count projection.
    *
    * Same physics as funnel: the one persisted step-typed scan, then
    * per step one user-keyed LEFT join (the qualifying window in the
    * join condition, so stalled users survive with nulls) and one
    * min-aggregate carrying the earlier anchors as group keys.
    *
    * @return (userCol, t_1 .. t_k) with t_i the step-i anchor or null */
  def funnelAnchors(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    maxGapSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val evs = CacheScope.register(
      events.filter(col(typeCol).isin(steps: _*))
        .select(col(userCol), col(tsCol), col(typeCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var anchors = evs.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_1"))
    steps.toList.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t_$i"
      val cur = s"t_${i + 1}"
      val side = evs.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      val carried = anchors.columns.map(col)
      anchors = anchors.join(side,
          col(userCol) === col("__u") && col("__ts") > col(prev) &&
            col("__ts") <= col(prev) + make_interval(lit(0), lit(0),
              lit(0), lit(0), lit(0), lit(0),
              lit(maxGapSeconds.toDouble)),
          "left")
        .groupBy(carried: _*)
        .agg(min(col("__ts")).as(cur))
    }
    anchors
  }

  /** Event-rate anomaly detection — the monitoring primitive over an
    * event stream: per event type, bucket the stream into fixed windows
    * (DENSELY — zero-event buckets count, which is exactly when an
    * outage alarm must fire), z-score each bucket's count against its
    * trailing `trailing` buckets, and flag |z| ≥ threshold.
    *
    * Determinism: counts are integers, and mean/variance use the
    * EXPLICIT sums formula — s/T and (ss − s²/T)/(T−1) from the
    * trailing sum and sum-of-squares — instead of avg/stddev
    * aggregates, so every arithmetic step is the same IEEE op sequence
    * in any engine (no merge-formula implementation variance); sqrt is
    * correctly rounded by IEEE. z is rounded after the divide.
    *
    * Scale: one (type, bucket) count shuffle collapses the stream;
    * everything after runs on the DENSE SERIES relation — types ×
    * time-range/bucket rows (a few years of hourly buckets is ~10⁴ per
    * type), metadata-sized however big the corpus. The per-type window
    * sorts that series, never events.
    *
    * @return (typeCol, bucket, c, z, anomaly) for every bucket with a
    *         full trailing history; z is null when the trailing window
    *         has zero variance (anomaly then = "count moved at all") */
  def rateAnomalies(events: DataFrame, tsCol: String, typeCol: String,
                    bucketSeconds: Long = 3600L, trailing: Int = 24,
                    zThreshold: Double = 2.0,
                    roundTo: Int = 6): DataFrame = {
    require(bucketSeconds > 0 && trailing >= 2, "need bucket > 0, trailing >= 2")
    import org.apache.spark.sql.expressions.Window
    val bk = floor(unix_timestamp(col(tsCol).cast("timestamp")) /
      bucketSeconds).cast("long")
    val counts = events.select(col(typeCol), bk.as("bucket"))
      .groupBy(col(typeCol), col("bucket")).agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min(col("bucket")).as("__lo"),
      max(col("bucket")).as("__hi"))
    val series = counts.select(col(typeCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(typeCol),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
      .join(counts, Seq(typeCol, "bucket"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("bucket"))
      .rowsBetween(-trailing, -1)
    val tT = lit(trailing.toDouble)
    val scored = series
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("c")).over(w).cast("double"))
      .withColumn("__ss", sum(col("c") * col("c")).over(w).cast("double"))
      .filter(col("__n") === trailing)
    val mean = col("__s") / tT
    val varr = greatest(
      (col("__ss") - col("__s") * col("__s") / tT) / (tT - 1), lit(0.0))
    val cD = col("c").cast("double")
    scored
      .withColumn("z",
        when(varr > 0, round((cD - mean) / sqrt(varr), roundTo)))
      .withColumn("anomaly",
        when(varr > 0, abs((cD - mean) / sqrt(varr)) >= zThreshold)
          .otherwise(cD =!= mean))
      .select(col(typeCol), col("bucket"), col("c"), col("z"),
        col("anomaly"))
  }

  /** Next-event transition matrix — the Markov view of an event stream:
    * for every (prev → next) pair of CONSECUTIVE events within a user's
    * timeline, how often it occurs and its conditional probability
    * p(next | prev). The path-analysis primitive behind "what do users
    * do after X" reports and behind first-order journey simulation.
    *
    * Determinism: a user's timeline is ordered by (ts, tieCol) — callers
    * pass a unique event id as the tie-break so simultaneous events
    * order identically in every engine. Probabilities are rounded AFTER
    * the divide (the q35/q65 float contract).
    *
    * Scale: ONE user-keyed window (lag) — a user's history is bounded
    * in product analytics, so no partition skew beyond the hottest user
    * — then one (prev, next)-keyed count whose output is |types|²-sized.
    * The per-prev totals aggregate and join run over that metadata-sized
    * relation, never the event stream.
    *
    * @return (prev_type, next_type, n, p) */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String,
                  roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(totals, "prev_type")
      .withColumn("p",
        round(col("n").cast("double") / col("__tot"), roundTo))
      .drop("__tot")
  }

  /** Top user journeys — the frequency table of each user's FIRST
    * `pathLen` event types in timeline order, joined with '>' into a
    * path string ("view>click>purchase"). Users with fewer events
    * contribute their full shorter path. The other half of path
    * analysis: where `transitions` is the first-order model, this is
    * the exact head-of-journey distribution.
    *
    * Scale: one user-keyed row_number window (Spark 4 plans a partial
    * WindowGroupLimit below the exchange for the rn ≤ pathLen filter,
    * so mappers forward at most pathLen rows per user), one per-user
    * aggregate whose collect_list is pathLen-bounded, and one
    * path-keyed count sized by distinct journeys ≤ |types|^pathLen.
    *
    * @return (path, n_users) */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, tieCol: String, pathLen: Int): DataFrame = {
    require(pathLen > 0, "pathLen must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("__et"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
      .groupBy(col(userCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col("__et")))),
        s => s("__et")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** @param steps         event-type sequence; the first step is
    *                      unconstrained in time
    * @param maxGapSeconds max allowed gap between consecutive steps
    * @return (step, step_name, n_users) — one row per step, n_users
    *         monotonically non-increasing down the funnel */
  /** Within-session sequence-pair mining: for every ordered pair of
    * event types (a, b), the number of SESSIONS whose first `a` strictly
    * precedes their first `b` — the sequential-pattern support measure
    * (the length-2 core of GSP/PrefixSpan) that complements
    * [[transitions]]: transitions see only ADJACENT steps, this sees
    * "a eventually leads to b in the same session" through any
    * intervening noise. Sessions are gap-based (builtin session_window),
    * the same islands q31 pins against the oracle.
    *
    * First-occurrence semantics make support well-defined under
    * repetition (a session counts once per pair); strict `<` on the
    * first-occurrence times drops simultaneous firsts deterministically.
    * Sessions are assigned with the islands window (lag + running sum)
    * — the per-USER session id a groupBy(session_window, user, type)
    * could not produce (it would sessionize each type's events
    * separately); boundary rule `diff >= gap breaks` matches
    * session_window's half-open [start, last + gap) exactly (the q31
    * oracle contract).
    *
    * Scale: the islands window is user-keyed (bounded timelines — the
    * q122 shape); one (user, session, type) min-aggregate collapses the
    * stream; the self-join is keyed on the session and bounded by
    * |types|² pairs per session — |types| is a schema-sized constant,
    * so the join output is sessions × |types|², never events². */
  def sequencePairs(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, tieCol: String,
                    gapSeconds: Long = 1800,
                    minSupport: Long = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(userCol).as("__u"), col(tsCol),
      col(tieCol), col(typeCol))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col(tsCol), col(tieCol))
    // integer microseconds: a seconds cast would TRUNCATE sub-second
    // parts and disagree with exact interval arithmetic at the gap
    // boundary; micros diffs are exact in both engines
    // (the NTZ→TZ cast only shifts both operands of every diff by the
    // same session-zone offset — gap decisions are invariant)
    val ts = unix_micros(col(tsCol).cast("timestamp"))
    val brk = when(lag(ts, 1).over(w).isNull
      || ts - lag(ts, 1).over(w) >= gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    val firsts = base
      .withColumn("__brk", brk) // window-in-window is illegal: two steps
      .withColumn("__sid", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__u"), col("__sid"), col(typeCol))
      .agg(min(col(tsCol)).as("__t0"))
    firsts.select(col("__u"), col("__sid"), col(typeCol).as("a"),
        col("__t0").as("__ta"))
      .join(firsts.select(col("__u"), col("__sid"),
        col(typeCol).as("b"), col("__t0").as("__tb")),
        Seq("__u", "__sid"))
      .filter(col("__ta") < col("__tb"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             maxGapSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // ONE pass over the fact table: only step-typed events survive (a
    // scan-speed, pushdown-able predicate) and the survivors persist —
    // each step's min-aggregate and join then read the cache instead of
    // re-scanning the corpus |steps| times
    val evs = CacheScope.register(
      events.filter(col(typeCol).isin(steps: _*))
        .select(col(userCol), col(tsCol), col(typeCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the reached set carries a renamed user key so each step's join
    // against the (re-derived) event scan is name-unambiguous
    var reached = evs.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .select(col(userCol).as("__u"), col("__t"))
    var counts = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("step"), lit(steps.head).as("step_name"),
        col("n_users"))
    steps.toList.zipWithIndex.drop(1).foreach { case (step, i) =>
      reached = evs.filter(col(typeCol) === step)
        .join(reached, col(userCol) === col("__u"))
        .filter(col(tsCol) > col("__t") &&
          col(tsCol) <= col("__t") + make_interval(lit(0), lit(0),
            lit(0), lit(0), lit(0), lit(0), lit(maxGapSeconds.toDouble)))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .select(col(userCol).as("__u"), col("__t"))
      counts = counts.union(reached.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(step).as("step_name"),
          col("n_users")))
    }
    counts
  }
}
