package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair and feature operators over keyed event data:
  * calendar gap-filling with forward fill, fixed-horizon rolling
  * aggregates, and variance-based anomaly flagging.
  *
  * These are the feature-engineering steps a training pipeline runs over
  * activity logs (per-user daily series for engagement features, per-type
  * daily counts for drift monitoring). All arithmetic is engine-portable:
  * date spines are integer `sequence` ranges, sums go through the
  * decimal(20,6) exact path, and the anomaly test is the sqrt-free
  * integer form `(N*x - S)^2 > k^2 * (N*Sxx - S^2)` so no libm call
  * (sqrt/stddev) ever enters an oracle-compared column.
  *
  * At 100 TB: the spine explode is map-side from a one-row-per-key
  * aggregate (never a driver loop); the forward-fill window carries one
  * row of state per key; rolling frames are bounded RANGE windows over
  * integer day indices. Hot keys sort within one partition — the standard
  * mitigation (pre-split by month, then stitch) composes on top.
  */
object Timeseries {

  /** Daily aggregate of `valueCol` per (key, day) with missing calendar
    * days restored and forward-filled.
    *
    * Output: (keyCol, day, observed, value_filled) where `observed` marks
    * real days and `value_filled` is the decimal-exact daily sum, carried
    * forward across gap days (NULL before a key's first observation —
    * there is nothing to carry).
    *
    * Plan shape: one hash agg to (key, day); one hash agg to per-key
    * [min_day, max_day]; `sequence()` explode of the spine (map-side —
    * the spine frame is rows_per_key ≈ span_days, generated distributed,
    * never collected); a key+day equi-join of spine to observations; one
    * window over key for the carry. The join and the window both hash on
    * the key, so AQE coalesces them into adjacent stages of the same
    * lineage — no driver-side state anywhere.
    */
  /** LOCF resampling of an IRREGULAR series onto a fixed grid —
    * last-observation-carried-forward, the standard "sensor readings /
    * account balances at arbitrary times → one value per step"
    * normalization ([[gapFillDaily]] zero-fills COUNTS; this carries
    * the last VALUE forward). Input is a LONG seconds column with
    * UNIQUE (key, sec) pairs — pre-aggregate duplicates upstream (a
    * duplicate raises IN-PLAN via the guard column, never a silent
    * nondeterministic pick — the mannKendall rule).
    *
    * Mechanics (one union + ONE per-key window — no per-grid-point
    * join): each key's grid spans `ceil(min/step)·step .. max` by
    * `step`; grid rows (tag 1, value NULL) union with observations
    * (tag 0), and `last(value, ignoreNulls)` over (sec, tag) order
    * carries the newest observation ≤ each grid point. Grid points
    * before the first observation emit NULL (honest — there is
    * nothing to carry). Output: (key, grid_sec, value_locf). */
  def resampleLocf(df: DataFrame, keyCol: String, secCol: String,
                   valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0, got $stepSeconds")
    val obs0 = df.filter(col(secCol).isNotNull)
      .select(col(keyCol).as("__k"), col(secCol).cast("long").as("__t"),
        col(valueCol).as("__v"))
    // in-plan duplicate guard: a second observation at the same
    // (key, sec) makes LOCF order-dependent — raise, don't guess
    val wDup = Window.partitionBy(col("__k"), col("__t"))
    val obs = obs0
      .withColumn("__v",
        when(count(lit(1)).over(wDup) > 1,
          raise_error(concat(lit("resampleLocf: duplicate (key, sec) at ("),
            col("__k").cast("string"), lit(", "),
            col("__t").cast("string"),
            lit(") — pre-aggregate to unique seconds"))))
          .otherwise(col("__v")))
      .withColumn("__tag", lit(0))
    val grid = obs0.groupBy(col("__k"))
      .agg(min(col("__t")).as("__mn"), max(col("__t")).as("__mx"))
      .withColumn("__g0",
        expr(s"((__mn + ${stepSeconds - 1}L) div ${stepSeconds}L)" +
          s" * ${stepSeconds}L"))
      // a key whose span contains no grid point emits nothing (an
      // unguarded sequence(start > stop) raises)
      .filter(col("__g0") <= col("__mx"))
      .select(col("__k"),
        explode(sequence(col("__g0"), col("__mx"), lit(stepSeconds)))
          .as("__t"))
      .withColumn("__v", lit(null).cast(obs0.schema("__v").dataType))
      .withColumn("__tag", lit(1))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(grid)
      .withColumn("__locf", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__k").as(keyCol), col("__t").as("grid_sec"),
        col("__locf").as("value_locf"))
  }

  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(graft.functions.ScalarFns.exactSum(col(valueCol)).as("day_value"))
    val spine = daily
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .select(col(keyCol),
        explode(sequence(col("min_day"), col("max_day"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("observed", col("day_value").isNotNull)
      .withColumn("value_filled",
        last(col("day_value"), ignoreNulls = true).over(w))
      .drop("day_value")
  }

  /** Rolling `windowDays`-day sum and observation count of the daily
    * series, computed with a RANGE frame over the integer day index
    * (`datediff` from epoch) — a calendar-correct moving window even when
    * days are missing, with no spine materialization at all.
    *
    * Output: (keyCol, day, n_days_observed, rolling_value). One shuffle
    * (the key window); the frame is bounded, so per-row state is
    * O(windowDays).
    */
  def rollingDaily(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    // the daily value stays DECIMAL through the rolling window (window
    // sums of doubles are partition-order-dependent — same rule as
    // ScalarFns.exactSum) and casts to double only at the very end
    val daily = df
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(sum(col(valueCol).cast("decimal(20,6)")).as("day_value"))
      .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day_idx").asc)
      .rangeBetween(-(windowDays - 1L), 0L)
    daily.select(col(keyCol), col("day"),
      count(lit(1)).over(w).as("n_days_observed"),
      sum(col("day_value")).over(w).cast("double").as("rolling_value"))
  }

  /** Days whose event count is an outlier versus the key's own history:
    * flags day x of key g when `(N*x - S)^2 > k^2 * (N*Sxx - S^2)`, the
    * integer-exact form of `|x - mean| > k * stddev_pop` (multiply both
    * sides by N^2; no sqrt, no division — every compared quantity is a
    * product of BIGINTs carried in decimal(38,0), bit-identical on any
    * engine; k enters as k^2, kept integral).
    *
    * Plan: one (key, day) count agg, one per-key moment agg (S, Sxx, N)
    * joined back broadcast-or-hash by key — two shuffles total, constant
    * state per key. Output only flagged rows: (keyCol, day, n_events).
    */
  def anomalousDays(df: DataFrame, keyCol: String, tsCol: String,
                    k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val d38 = "decimal(38,0)"
    val daily = df
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).cast(d38).as("n_events"))
    val moments = daily.groupBy(col(keyCol)).agg(
      sum(col("n_events")).cast(d38).as("s1"),
      sum(col("n_events") * col("n_events")).cast(d38).as("s2"),
      count(lit(1)).cast(d38).as("n"))
    val lhs = (col("n") * col("n_events") - col("s1")) *
      (col("n") * col("n_events") - col("s1"))
    val rhs = lit(k.toLong * k).cast(d38) * (col("n") * col("s2") - col("s1") * col("s1"))
    daily.join(Broadcasts.maybeBroadcast(moments), Seq(keyCol))
      .filter(lhs > rhs)
      .select(col(keyCol), col("day"), col("n_events").cast("long").as("n_events"))
  }

  /** Per-key linear trend of the daily event-count series: closed-form
    * OLS over (x = days since the key's first active day, y = daily
    * count) — the drift detector behind "is this source growing or
    * dying". Returns (keyCol, n_days, slope, intercept) for keys with
    * >= 2 distinct days and non-degenerate x variance.
    *
    * Exactness: all five moments (N, Σx, Σy, Σxy, Σx²) accumulate in
    * decimal(38,0) — order-independent integer sums. Only the final
    * slope/intercept evaluate in double, as single IEEE expressions over
    * exactly-representable operands (x is rebased per key, so the
    * moments stay ≪ 2^53 even on century-long series) — bit-identical on
    * any engine. Plan: (key, day) count agg → per-key min-day window
    * (the groupBy that follows reuses the window's hash partitioning on
    * the key) → one moments agg. Two exchanges, constant state per key.
    */
  def trendByKey(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = df
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val wk = Window.partitionBy(col(keyCol))
    val based = daily
      .withColumn("x", datediff(col("day"), min(col("day")).over(wk)))
    val m = based.groupBy(col(keyCol)).agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x")).cast(d38).as("sx"),
      sum(col("y")).cast(d38).as("sy"),
      sum(col("x") * col("y")).cast(d38).as("sxy"),
      sum(col("x") * col("x")).cast(d38).as("sxx"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    m.filter(col("n") >= 2 &&
        (col("n") * col("sxx") - col("sx") * col("sx")) =!= 0)
      .withColumn("slope", num / den)
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select(col(keyCol), col("n").cast("long").as("n_days"),
        col("slope"), col("intercept"))
  }

  /** Period-over-period comparison: each day's aggregate next to the
    * value `lagDays` earlier, with absolute and guarded relative
    * deltas — the WoW/MoM dashboard row. The prior period comes from a
    * self-JOIN on the shifted calendar day, NOT a row-lag window, so
    * gap days cannot silently misalign periods (lag(7) over rows is
    * wrong the first time a day is missing). Days with no prior-period
    * row report NULL deltas.
    *
    * Shape: one day aggregate (map-side combine), one day-keyed join of
    * the day table against itself — |days| rows, metadata-scale. */
  def periodOverPeriod(df: DataFrame, tsCol: String, valCol: String,
                       lagDays: Int): DataFrame = {
    require(lagDays >= 1, s"lagDays must be >= 1, got $lagDays")
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.ScalarFns.exactSum(col(valCol)).as("sum_value"))
    val prior = daily.select(
      date_add(col("day"), lagDays).as("day"),
      col("n_events").as("prior_n_events"),
      col("sum_value").as("prior_sum_value"))
    daily.join(prior, Seq("day"), "left")
      .withColumn("delta", col("sum_value") - col("prior_sum_value"))
      .withColumn("pct_change",
        when(col("prior_sum_value").isNotNull && col("prior_sum_value") =!= 0.0,
          (col("sum_value") - col("prior_sum_value")) / col("prior_sum_value")))
  }

  /** Single change-point (level-shift) detection per key: the day
    * boundary that maximizes |mean(before) − mean(after)| over the
    * key's OBSERVED daily values — the "when did this metric move"
    * primitive behind regression triage and data-drift alarms. The
    * two-window scan is O(days) per key: one running decimal sum gives
    * every prefix/suffix mean; no per-boundary rescan.
    *
    * Exactness: daily values and their running sums stay decimal (order
    * -free); each candidate's means are one double division each, the
    * shift is one subtraction — fixed IEEE trees, so argmax (ties →
    * earliest boundary) is engine-deterministic. Keys with fewer than
    * two observed days have no interior boundary and are absent.
    *
    * Output: (key, boundary_day = last day of the left segment,
    * n_days, mean_before, mean_after, shift). */
  def levelShift(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valCol).cast("decimal(20,6)")).cast("decimal(38,6)")
        .as("__v"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
    val scored = daily
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("day").asc)).cast("long"))
      .withColumn("__si", sum(col("__v")).over(wOrd).cast("decimal(38,6)"))
      .withColumn("__n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("__sn", sum(col("__v")).over(wAll).cast("decimal(38,6)"))
      .filter(col("__i") < col("__n")) // interior boundaries only
      .withColumn("mean_before",
        col("__si").cast("double") / col("__i").cast("double"))
      .withColumn("mean_after",
        (col("__sn") - col("__si")).cast("double")
          / (col("__n") - col("__i")).cast("double"))
      .withColumn("shift", abs(col("mean_before") - col("mean_after")))
    scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("shift").desc, col("day").asc)))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col("day").as("boundary_day"),
        col("__n").as("n_days"), col("mean_before"), col("mean_after"),
        col("shift"))
  }

  /** Time-decayed engagement score per key — recent activity counts
    * more, with a STAIRCASE half-life decay that stays engine-exact:
    * weight = 2^-⌊age/halflife⌋ (the continuous e^{-λ·age} variant is
    * one libm exp away but not oracle-comparable; the staircase loses
    * at most a factor 2 of resolution within a bucket).
    *
    * Exactness: contributions accumulate as
    * decimal(value) · 2^(maxBuckets − bucket) — an INTEGER-weighted
    * decimal sum, order-independent — and the single final division by
    * 2^maxBuckets is an exact power-of-two double scaling. Events older
    * than maxBuckets half-lives (weight < 2^-maxBuckets) and events
    * after `asOf` are excluded — both the recency semantics and the
    * overflow bound (weights fit a BIGINT for maxBuckets ≤ 62; the
    * default 30 keeps the decimal product inside precision 38).
    *
    * Shape at 100 TB: one map stage (bucket + weight) into one key agg
    * with map-side combine; `asOf` is an explicit parameter, so the
    * operator is pure and replayable. */
  def decayedScore(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, asOf: java.sql.Timestamp,
                   halflifeSeconds: Long, maxBuckets: Int = 30): DataFrame = {
    require(halflifeSeconds > 0, s"halflifeSeconds must be positive")
    require(maxBuckets >= 1 && maxBuckets <= 62, s"maxBuckets in [1, 62]")
    val asOfUs = unix_micros(lit(asOf))
    val ageUs = asOfUs - unix_micros(col(tsCol).cast("timestamp"))
    df.filter(col(tsCol).cast("timestamp") <= lit(asOf))
      .withColumn("__age_us", ageUs)
      .withColumn("__bkt", expr(s"__age_us div ${halflifeSeconds * 1000000L}L"))
      .filter(col("__bkt") < maxBuckets)
      .withColumn("__w",
        expr(s"shiftleft(1L, cast($maxBuckets - __bkt as int))"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        (sum(col(valCol).cast("decimal(20,6)") * col("__w")).cast("double")
          / lit(math.pow(2.0, maxBuckets))).as("decayed_score"))
  }

  /** Burst detection: buckets whose event count spikes against their
    * own trailing baseline — the streaming-abuse / incident-onset
    * readout ([[levelShift]] finds one sustained regime change;
    * this flags every transient spike). Bucket = integer
    * `epoch div bucketSeconds`; the bucket axis is GAP-FILLED from a
    * generated integer range so the trailing window always spans real
    * time, not "previous nonempty buckets" (a quiet hour must not
    * stretch the baseline back a day).
    *
    * Burst test is EXACT integer cross-multiplication:
    * `cnt * n_prev * factorDen >= factorNum * baseline_sum` with the
    * trailing `trailingN` buckets as baseline (current excluded; the
    * first `trailingN` buckets have partial baselines and test against
    * what exists). `ratio` is one exact division for human reading.
    *
    * Scale shape: one hash aggregate to per-bucket counts, then one
    * window over the BUCKET table — calendar-scale (8.8k rows/year of
    * hours), the documented metadata-scale escape, regardless of input
    * row count. */
  /** Day-of-week seasonal index of a daily value series — the
    * seasonality profile a forecasting pipeline divides out before
    * trend-fitting, and the sanity check behind "is Monday really our
    * slow day". For each weekday: observed days, total value, mean
    * value, and the seasonal index = dow mean / grand daily mean
    * (index 1.0 = a typical day).
    *
    * Engine portability: the weekday comes from PURE INTEGER calendar
    * arithmetic — `(days_since_epoch + 3) % 7` (0 = Monday; 1970-01-01
    * was a Thursday) — never from a `dayofweek()` builtin, because
    * engines disagree on week-start conventions (Spark counts Sunday=1,
    * DuckDB Sunday=0, ISO Monday=1). Sums stay decimal to the end; the
    * mean and the index are fixed two-division IEEE trees evaluated
    * identically everywhere.
    *
    * Shape at 100 TB: one (day) hash aggregate with map-side combine,
    * then a 7-row weekday aggregate and a one-row grand-total frame
    * broadcast back — nothing past the first aggregate touches data
    * scale. */
  def seasonalIndex(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(graft.functions.ScalarFns.exactSum(col(valCol)).as("day_value"))
      .withColumn("dow",
        ((datediff(col("day"), lit("1970-01-01").cast("date")) + 3) % 7)
          .cast("int"))
    // day_value is a decimal-exact double (exactSum contract) — route the
    // second-level sums back through decimal so they stay order-free
    val byDow = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("day_value").cast("decimal(20,6)")).cast("decimal(38,6)")
          .as("__dt"))
    val grand = daily.agg(count(lit(1)).as("__n_total"),
      sum(col("day_value").cast("decimal(20,6)")).cast("decimal(38,6)")
        .as("__gt"))
    byDow.join(Broadcasts.maybeBroadcast(grand))
      .withColumn("dow_total", col("__dt").cast("double"))
      .withColumn("dow_mean",
        col("__dt").cast("double") / col("n_days").cast("double"))
      .withColumn("seasonal_index",
        (col("__dt").cast("double") / col("n_days").cast("double"))
          / (col("__gt").cast("double") / col("__n_total").cast("double")))
      .select(col("dow"), col("n_days"), col("dow_total"), col("dow_mean"),
        col("seasonal_index"))
  }

  /** Lag-k autocorrelation of each key's daily event-count series —
    * "does today predict next week" (lag 7 ≈ weekly seasonality
    * strength, lag 1 ≈ short-term momentum), the feature-selection
    * screen before fitting any sequence model per key.
    *
    * Day d is paired with day d+lag via a CALENDAR self-join on the
    * shifted day (the [[periodOverPeriod]] rule: a row-lag window
    * silently misaligns the first time a day is missing). Pearson r
    * comes from exact decimal moments over the matched pairs —
    * `(n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²))` — with the
    * numerator/denominators exact BIGINT-derived decimals and the final
    * expression a fixed IEEE tree (IEEE-754 `sqrt` is correctly rounded,
    * so it is engine-deterministic, unlike log/exp). Degenerate series
    * (a constant side) report NULL. Keys with fewer than `minPairs`
    * matched pairs are dropped.
    *
    * Shape: one (key, day) count aggregate, one day-shifted key
    * equi-join of the day table against itself (|keys|·|days| rows —
    * metadata-scale), one per-key moment aggregate. */
  def autocorrelation(df: DataFrame, keyCol: String, tsCol: String,
                      lagDays: Int, minPairs: Int = 3): DataFrame = {
    require(lagDays >= 1, s"lagDays must be >= 1, got $lagDays")
    val d38 = "decimal(38,0)"
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val shifted = daily.select(col(keyCol),
      date_add(col("day"), lagDays).as("day"), col("cnt").as("__y"))
    val paired = daily.join(shifted, Seq(keyCol, "day"))
      .select(col(keyCol), col("cnt").cast(d38).as("__x"),
        col("__y").cast(d38).as("__y"))
    val m = paired.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("n_pairs"),
      sum(col("__x")).cast(d38).as("__sx"),
      sum(col("__y")).cast(d38).as("__sy"),
      sum(col("__x") * col("__x")).cast(d38).as("__sxx"),
      sum(col("__y") * col("__y")).cast(d38).as("__syy"),
      sum(col("__x") * col("__y")).cast(d38).as("__sxy"))
    val nD = col("n_pairs").cast("double")
    // keep each subtraction on ONE expression line: a continuation line
    // starting with `-` is a new (discarded) unary-minus statement to
    // Scala's semicolon inference — the subtraction silently vanishes
    val num = (nD * col("__sxy").cast("double")) -
      (col("__sx").cast("double") * col("__sy").cast("double"))
    val dx = (nD * col("__sxx").cast("double")) -
      (col("__sx").cast("double") * col("__sx").cast("double"))
    val dy = (nD * col("__syy").cast("double")) -
      (col("__sy").cast("double") * col("__sy").cast("double"))
    m.filter(col("n_pairs") >= minPairs)
      .select(col(keyCol), lit(lagDays).as("lag_days"), col("n_pairs"),
        when(dx > lit(0.0) && dy > lit(0.0),
          num / (sqrt(dx) * sqrt(dy))).as("autocorr"))
  }

  /** Two-sided CUSUM drift detection over each key's daily count series
    * — the classic "small persistent shift" alarm that a plain
    * per-day threshold ([[anomalousDays]]) can't see: five days of +20%
    * never trips a 3σ day test but accumulates immediately here.
    *
    * Runs in EXACT integer micro-units end to end. Target = the key's
    * own mean daily count, `(S·1e6) div n_days`; each day's deviation
    * `dev = cnt·1e6 − target − slack` (and the mirrored
    * `target − cnt·1e6 − slack` for the downward side). The textbook
    * recursion `S⁺_i = max(0, S⁺_{i-1} + dev_i)` is NOT windowable, but
    * its closed form is: `S⁺_i = P_i − min(0, min_{j≤i} P_j)` with P
    * the prefix sum — one running-sum window plus one running-min
    * window, both per-key partitioned and order-exact on BIGINTs.
    * Missing calendar days count as ZERO events (a silent feed is
    * exactly what the downward side must catch), restored via the
    * per-key [[gapFillDaily]]-style spine.
    *
    * Alarms fire when a side exceeds `hMicro` (in count-micro-units,
    * e.g. 5.0 days-worth of mean drift = 5e6·mean... caller picks the
    * scale — the operator stays parameter-honest rather than deriving a
    * σ it can't compute without sqrt).
    *
    * Output: (key, day, n_events, s_plus_micro, s_minus_micro,
    * alarm_up, alarm_down). Shape: one (key, day) aggregate, a spine
    * explode from per-key bounds, one per-key target join, two windows
    * on the same (key ordered by day) shuffle. */
  def cusum(df: DataFrame, keyCol: String, tsCol: String,
            slackMicro: Long, hMicro: Long): DataFrame =
    cusumFromDaily(
      df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("cnt")),
      keyCol, slackMicro, hMicro)

  /** [[cusum]] from an already-aggregated (key, day, cnt) daily table —
    * the entry point the streaming sink re-derives alarms through after
    * each counts merge (the daily table is days-scale, so a full
    * re-derive per micro-batch is cheaper than any state threading). */
  def cusumFromDaily(daily: DataFrame, keyCol: String,
                     slackMicro: Long, hMicro: Long): DataFrame = {
    require(slackMicro >= 0 && hMicro > 0, "slackMicro >= 0, hMicro > 0")
    val M = 1000000L
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"),
        sum(col("cnt")).as("__s"), count(lit(1)).as("__nobs"))
      .withColumn("__span",
        (datediff(col("__hi"), col("__lo")) + 1).cast("long"))
      // target over the FULL calendar span (zero-days included), so the
      // baseline matches what the series actually delivers per day
      .withColumn("__target", expr("(__s * 1000000) div __span"))
      .select(col(keyCol), col("__target"),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("n_events", coalesce(col("cnt"), lit(0L)))
      .withColumn("__dev_up", col("n_events") * M - col("__target") - slackMicro)
      .withColumn("__dev_dn", col("__target") - col("n_events") * M - slackMicro)
      .withColumn("__pu", sum(col("__dev_up")).over(w))
      .withColumn("__pd", sum(col("__dev_dn")).over(w))
      .withColumn("s_plus_micro",
        col("__pu") - least(lit(0L), min(col("__pu")).over(w)))
      .withColumn("s_minus_micro",
        col("__pd") - least(lit(0L), min(col("__pd")).over(w)))
      .withColumn("alarm_up", col("s_plus_micro") > hMicro)
      .withColumn("alarm_down", col("s_minus_micro") > hMicro)
      .select(col(keyCol), col("day"), col("n_events"),
        col("s_plus_micro"), col("s_minus_micro"),
        col("alarm_up"), col("alarm_down"))
  }

  /** Theil-Sen robust trend per key: the MEDIAN of all pairwise daily
    * slopes — the robust twin of [[trendByKey]]'s OLS line (one wild
    * outlier day drags a least-squares slope arbitrarily; it moves the
    * pairwise-slope median not at all, up to a 29% breakdown point).
    *
    * Exactness: daily values take the decimal path; each pairwise
    * slope is ONE double subtraction over ONE integer-day division —
    * a fixed IEEE tree; the median is the engine's lower-median
    * convention (smallest slope with 2·rank ≥ n over the per-key
    * slope ordering) — positional, so duplicate slope values cannot
    * make engines disagree.
    *
    * Cost contract: C(days, 2) pairs PER KEY — quadratic in the key's
    * OBSERVED DAYS (not events): ~500 pairs for a month, ~66k for a
    * year. For multi-year series, pre-aggregate to weeks upstream.
    * Keys with fewer than two days are absent. */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(graft.functions.ScalarFns.exactSum(col(valCol)).as("__v"))
      .withColumn("__d",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") && col("a.__d") < col("b.__d"))
      .select(col(s"a.$keyCol").as(keyCol),
        ((col("b.__v") - col("a.__v"))
          / (col("b.__d") - col("a.__d")).cast("double")).as("__slope"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("__slope").asc)
    val wAll = Window.partitionBy(col(keyCol))
    pairs
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(lit(2L) * col("__rn") >= col("__n"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_pairs"),
        min(col("__slope")).as("theil_sen_slope"))
  }

  /** Siegel repeated-median slope per key — [[theilSen]]'s
    * 50%-breakdown upgrade (Theil–Sen's single median over all pair
    * slopes breaks down at ~29% outliers; Siegel medians TWICE — per
    * point over its slopes to every other point, then over the
    * per-point medians — and survives until half the POINTS are bad).
    * Same exact substrate as theilSen (daily exactSum values, integer
    * day deltas, the positional lower-median rule at both levels);
    * each unordered pair contributes its slope to BOTH endpoints, so
    * the per-point frames have n−1 slopes each. C(n,2) pair cost per
    * key — the documented theilSen contract.
    *
    * Output per key: (key, n_points, siegel_slope). Keys with < 2
    * days have no slope and drop (the theilSen convention). */
  def siegelSlope(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(graft.functions.ScalarFns.exactSum(col(valCol)).as("__v"))
      .withColumn("__d",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") && col("a.__d") < col("b.__d"))
      .select(col(s"a.$keyCol").as(keyCol),
        col("a.__d").as("__i"), col("b.__d").as("__j"),
        ((col("b.__v") - col("a.__v"))
          / (col("b.__d") - col("a.__d")).cast("double")).as("__slope"))
    // each slope belongs to BOTH endpoints' per-point frames
    val perPoint = pairs.select(col(keyCol),
        explode(array(col("__i"), col("__j"))).as("__pt"),
        col("__slope"))
    val wOrd1 = Window.partitionBy(col(keyCol), col("__pt"))
      .orderBy(col("__slope").asc)
    val wAll1 = Window.partitionBy(col(keyCol), col("__pt"))
    val med = perPoint
      .withColumn("__rn", row_number().over(wOrd1).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll1))
      .filter(lit(2L) * col("__rn") >= col("__n"))
      .groupBy(col(keyCol), col("__pt"))
      .agg(min(col("__slope")).as("__med"))
    val wOrd2 = Window.partitionBy(col(keyCol)).orderBy(col("__med").asc)
    val wAll2 = Window.partitionBy(col(keyCol))
    med
      .withColumn("__rn", row_number().over(wOrd2).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll2))
      .filter(lit(2L) * col("__rn") >= col("__n"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).cast("long").as("n_points"),
        min(col("__med")).as("siegel_slope"))
  }

  def burstDetect(df: DataFrame, tsCol: String, bucketSeconds: Long,
                  trailingN: Int, factorNum: Long, factorDen: Long): DataFrame = {
    require(bucketSeconds > 0 && trailingN >= 1 && factorNum > 0 && factorDen > 0,
      "bucketSeconds/trailingN/factor must be positive")
    val counts = df
      .withColumn("__b",
        expr(s"unix_micros(cast(${tsCol} as timestamp)) div ${bucketSeconds * 1000000L}L"))
      .groupBy(col("__b")).agg(count(lit(1)).as("cnt"))
    val range = counts.agg(min(col("__b")).as("lo"), max(col("__b")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("__b"))
    val w = Window.orderBy(col("__b"))
      .rowsBetween(-trailingN.toLong, -1L)
    range.join(counts, Seq("__b"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("baseline_sum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("bucket_start",
        timestamp_micros(col("__b") * lit(bucketSeconds * 1000000L)))
      .withColumn("ratio",
        when(col("baseline_sum") > 0,
          (col("cnt") * col("n_prev")).cast("double")
            / col("baseline_sum").cast("double")))
      .withColumn("is_burst",
        col("n_prev") > 0 && col("baseline_sum") >= 0 &&
          col("cnt") * col("n_prev") * lit(factorDen) >=
            lit(factorNum) * col("baseline_sum") && col("cnt") > 0)
      .select(col("__b").as("bucket_id"), col("bucket_start"), col("cnt"),
        col("baseline_sum"), col("n_prev"), col("ratio"), col("is_burst"))
  }

  /** Lagged CROSS-correlation between two keys' daily count series —
    * "do clicks lead purchases, and by how many days": Pearson r of
    * (A at day d, B at day d+lag) for every lag in [−maxLagDays,
    * maxLagDays]. Positive-lag peaks mean A LEADS B; the lag-0 column
    * is plain co-movement; the mirrored negative lags complete the
    * lead/lag scan a metric-dependency investigation reads.
    *
    * Determinism inherits [[autocorrelation]] wholesale: calendar-join
    * pairing (a row-lag window misaligns on gaps), exact decimal
    * moments, the fixed `(n·Sxy−SxSy)/(√dx·√dy)` IEEE tree (sqrt is
    * correctly rounded — portable), NULL on degenerate sides, lags
    * with fewer than `minPairs` matched days dropped.
    *
    * Shape: one (key, day) aggregate; series A and B are days-scale
    * slices of it; the lag fan-out multiplies B's day table by
    * (2·maxLag+1) BEFORE the join (days × lags — metadata-scale), so
    * the raw stream is touched by the one aggregate only. */
  def crossCorrelation(df: DataFrame, keyCol: String, tsCol: String,
                       keyA: String, keyB: String, maxLagDays: Int,
                       minPairs: Int = 3): DataFrame = {
    require(maxLagDays >= 0, s"maxLagDays must be >= 0, got $maxLagDays")
    val d38 = "decimal(38,0)"
    val daily = df.filter(col(keyCol).isin(keyA, keyB))
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val a = daily.filter(col(keyCol) === keyA)
      .select(col("day"), col("cnt").as("__x"))
    val b = daily.filter(col(keyCol) === keyB)
      .select(col("day").as("__bday"), col("cnt").as("__y"))
    val lagged = b
      .crossJoin(broadcast(
        spark_range_lags(-maxLagDays, maxLagDays)(daily.sparkSession)))
      .withColumn("day", expr("date_add(__bday, -lag_days)"))
    val paired = a.join(lagged, Seq("day"))
      .select(col("lag_days"), col("__x").cast(d38).as("__x"),
        col("__y").cast(d38).as("__y"))
    val m = paired.groupBy(col("lag_days")).agg(
      count(lit(1)).cast("long").as("n_pairs"),
      sum(col("__x")).cast(d38).as("__sx"),
      sum(col("__y")).cast(d38).as("__sy"),
      sum(col("__x") * col("__x")).cast(d38).as("__sxx"),
      sum(col("__y") * col("__y")).cast(d38).as("__syy"),
      sum(col("__x") * col("__y")).cast(d38).as("__sxy"))
    val nD = col("n_pairs").cast("double")
    // one-line subtractions (leading-`-` continuation trap — NOTES.md)
    val num = (nD * col("__sxy").cast("double")) -
      (col("__sx").cast("double") * col("__sy").cast("double"))
    val dx = (nD * col("__sxx").cast("double")) -
      (col("__sx").cast("double") * col("__sx").cast("double"))
    val dy = (nD * col("__syy").cast("double")) -
      (col("__sy").cast("double") * col("__sy").cast("double"))
    m.filter(col("n_pairs") >= minPairs)
      .select(col("lag_days"), col("n_pairs"),
        when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy))).as("r"))
  }

  /** One-row-per-lag frame [−maxLag, maxLag] (broadcast fan-out). */
  private def spark_range_lags(lo: Int, hi: Int)(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(lo, hi + 1L).select(col("id").cast("int").as("lag_days"))

  /** Seasonal-naive forecast backtest: forecast each day's count as
    * the SAME key's count `periodDays` earlier (the no-model baseline
    * every real forecast must beat — if your model loses to "same day
    * last week", ship the calendar), evaluated over every day with a
    * matching history day. Errors are exact integers; per key the
    * report carries `n_days`, `sum_abs_err`, `total_actual`, WAPE
    * (Σ|err|/Σactual — the aggregate-safe percentage error; per-day
    * MAPE blows up on zero days) and MAE, each ONE final division.
    *
    * Missing calendar days count as ZERO on both sides via the per-key
    * day spine (a silent feed is a forecastable zero, not a hole) —
    * the [[cusumFromDaily]] spine rule. Shape: one (key, day)
    * aggregate, a spine explode, one day-shifted self-join
    * (days-scale), one per-key rollup. */
  def seasonalNaiveBacktest(df: DataFrame, keyCol: String, tsCol: String,
                            periodDays: Int): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val filled = spine.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val forecast = filled.select(col(keyCol),
      date_add(col("day"), periodDays).as("day"), col("cnt").as("__fc"))
    filled.join(forecast, Seq(keyCol, "day"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cnt") - col("__fc"))).cast("long").as("sum_abs_err"),
        sum(col("cnt")).cast("long").as("total_actual"))
      .withColumn("wape",
        when(col("total_actual") > 0,
          col("sum_abs_err").cast("double") / col("total_actual").cast("double")))
      .withColumn("mae",
        col("sum_abs_err").cast("double") / col("n_days").cast("double"))
  }

  /** OHLC bars per (key, bucket): open/high/low/close/volume — the
    * market-data rollup, generalized to any event stream (first/last
    * value per bucket with exact tie order, extremes, decimal-exact
    * volume). `bucketCol` is any caller-derived bucket (day, hour,
    * month key); `tieCol` breaks equal timestamps so open/close are
    * TOTAL-ORDER deterministic (the W1 dedup discipline).
    *
    * Shape: one hash aggregate over the stream for counts/extremes and
    * the boundary instants (min/max ts — primitive, hash-friendly);
    * open/close VALUES come from a second, boundary-restricted pass —
    * the bars frame (keys × buckets) joins back and keeps only rows AT
    * a boundary instant, so the struct-ordered tie aggregate runs on a
    * boundary-scale frame, never row-scale (the NOTES.md
    * min(struct)-SortAggregate trap stays out of the hot path).
    *
    * Output: (key, bucket, n_events, volume, open, high, low, close). */
  def ohlcBars(df: DataFrame, keyCol: String, bucketCol: String,
               tsCol: String, tieCol: String, valueCol: String): DataFrame = {
    val base = df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull
      && col(tieCol).isNotNull)
    val bars = base.groupBy(col(keyCol), col(bucketCol))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.ScalarFns.exactSum(col(valueCol)).as("volume"),
        max(col(valueCol)).as("high"), min(col(valueCol)).as("low"),
        min(col(tsCol)).as("__ots"), max(col(tsCol)).as("__cts"))
    val boundary = base.join(
      Broadcasts.maybeBroadcast(bars.select(col(keyCol), col(bucketCol),
        col("__ots"), col("__cts"))),
      Seq(keyCol, bucketCol))
      .filter(col(tsCol) === col("__ots") || col(tsCol) === col("__cts"))
      .groupBy(col(keyCol), col(bucketCol))
      .agg(
        min(when(col(tsCol) === col("__ots"),
          struct(col(tieCol).as("t"), col(valueCol).as("v")))).as("__o"),
        max(when(col(tsCol) === col("__cts"),
          struct(col(tieCol).as("t"), col(valueCol).as("v")))).as("__c"))
      .select(col(keyCol), col(bucketCol),
        col("__o.v").as("open"), col("__c.v").as("close"))
    bars.join(boundary, Seq(keyCol, bucketCol))
      .select(col(keyCol), col(bucketCol), col("n_events"), col("volume"),
        col("open"), col("high"), col("low"), col("close"))
  }


  /** Durbin–Watson statistic per key — "are the residuals of this
    * series serially correlated?" (the first diagnostic after any
    * per-key trend fit; d ≈ 2 is uncorrelated, → 0 positive, → 4
    * negative autocorrelation): `d = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t²`
    * over the x-ordered series. Exactness via scale-invariance: the
    * caller's values are mean-centered INTEGRALLY as
    * `e_t = n·x_t − Σx` (multiplying through by n leaves d unchanged —
    * both sums scale by n²), so numerator and denominator are exact
    * BIGINTs on the cent grid and d is one division. `(key, x)` must
    * be unique (the [[graft.operators.RankStats.mannKendall]]
    * pre-aggregated-series contract — duplicates raise); the lag
    * window is per-key series-scale. BIGINT bound: Σe² ≤ n³·x_max² —
    * loud ANSI overflow past it.
    *
    * Output per key: (key, n, dw_num, dw_den, dw) — dw NULL when the
    * series is constant (den = 0) or has < 2 points. */
  def durbinWatson(df: DataFrame, keyCol: String, xCol: String,
                   valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "durbinWatson: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    val tot = cells.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).cast("long").as("__s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
    cells.join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__e",
        (col("__n").cast(d38) * col("__v") - col("__s")).cast(d38))
      .withColumn("__lag", lag(col("__e"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).cast("long").as("n"),
        sum(when(col("__lag").isNotNull,
          (col("__e") - col("__lag")) * (col("__e") - col("__lag")))
          .otherwise(lit(0).cast(d38))).cast(d38).cast("long").as("dw_num"),
        sum(col("__e") * col("__e")).cast(d38).cast("long").as("dw_den"))
      .withColumn("dw",
        when(col("n") > 1 && col("dw_den") > 0,
          col("dw_num").cast("double") / col("dw_den").cast("double")))
  }

  /** Mean absolute scaled error (Hyndman & Koehler 2006) parts per
    * key — the forecast-accuracy readout for the SEASONAL-NAIVE
    * forecast (ŷ_t = y_{t−period}), scaled by the one-step naive
    * in-sample MAE: mase = (Σ|y_t − y_{t−period}|/n_p) /
    * (Σ|y_t − y_{t−1}|/n_1). MASE < 1 means the seasonal pattern
    * carries real signal beyond persistence.
    *
    * Exactness (the parts-emission convention): values cents-scale to
    * BIGINT (2-dp grid, the [[durbinWatson]] cell contract incl. the
    * duplicate-x raise), both absolute-error sums are exact BIGINTs,
    * and `mase` is one fixed IEEE tree over them — oracle-hashable
    * end to end. Lags are ROW lags over the x-order: on a gappy index
    * the statistic is still exact and engine-identical, but its
    * seasonal interpretation assumes a dense index (gap-fill
    * upstream via [[gapFillDaily]]/[[resampleLocf]] when days can be
    * missing). NULL when either error window is empty or the naive
    * MAE is zero (constant series — MASE undefined).
    * One window pass + one hash aggregate per key. */
  def maseParts(df: DataFrame, keyCol: String, xCol: String,
                valueCol: String, period: Int): DataFrame = {
    require(period >= 1, s"period must be >= 1, got $period")
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "maseParts: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
    cells
      .withColumn("__l1", lag(col("__v"), 1).over(w))
      .withColumn("__lp", lag(col("__v"), period).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(abs(col("__v") - col("__lp"))).cast("long")
          .as("abs_err_seasonal"),
        count(col("__lp")).cast("long").as("n_seasonal"),
        sum(abs(col("__v") - col("__l1"))).cast("long")
          .as("abs_err_naive"),
        count(col("__l1")).cast("long").as("n_naive"))
      .withColumn("mase",
        when(col("n_seasonal") > 0 && col("n_naive") > 0
            && col("abs_err_naive") > 0,
          (col("abs_err_seasonal").cast("double") / col("n_seasonal")) /
            (col("abs_err_naive").cast("double") / col("n_naive"))))
  }

  /** Wald–Wolfowitz runs test per key — "do the residual SIGNS cluster
    * or alternate more than chance?" (the randomness companion of
    * [[durbinWatson]]'s magnitude view, and robust to any monotone
    * value transform): over the x-ordered series with the same exact
    * integral centering `e_t = n·x_t − Σx`, count sign runs
    * `R = 1 + Σ[sign(e_t) ≠ sign(e_{t−1})]` among NONZERO residuals
    * (zeros carry no sign — excluded, the standard convention,
    * documented rather than smuggled into either side), then
    * `E[R] = 1 + 2pm/(p+m)` and
    * `Var[R] = 2pm(2pm−p−m)/((p+m)²(p+m−1))`; z is one fixed double
    * chain from the exact integers. Same unique-x contract as
    * [[durbinWatson]].
    *
    * Output per key: (key, n_pos, n_neg, n_runs, z) — z NULL when
    * either sign is absent or p+m < 2. */
  def runsTest(df: DataFrame, keyCol: String, xCol: String,
               valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "runsTest: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    val tot = cells.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).cast("long").as("__s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
    val signed = cells.join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__e",
        (col("__n").cast(d38) * col("__v") - col("__s")).cast(d38))
      .filter(col("__e") =!= 0)
      .withColumn("__sgn", when(col("__e") > 0, 1L).otherwise(-1L))
      .withColumn("__prev", lag(col("__sgn"), 1).over(w))
    signed.groupBy(col(keyCol))
      .agg(
        sum(when(col("__sgn") === 1L, 1L).otherwise(0L)).cast("long")
          .as("n_pos"),
        sum(when(col("__sgn") === -1L, 1L).otherwise(0L)).cast("long")
          .as("n_neg"),
        (sum(when(col("__prev").isNotNull
          && col("__prev") =!= col("__sgn"), 1L).otherwise(0L)) + 1L)
          .cast("long").as("n_runs"))
      .withColumn("z", {
        val p = col("n_pos").cast("double"); val m = col("n_neg").cast("double")
        val nn = p + m
        val er = lit(1.0) + lit(2.0) * p * m / nn
        val vr = (lit(2.0) * p * m * (lit(2.0) * p * m - nn)) /
          (nn * nn * (nn - 1.0))
        when(col("n_pos") > 0 && col("n_neg") > 0
          && col("n_pos") + col("n_neg") > 1 && vr > 0.0,
          (col("n_runs").cast("double") - er) / sqrt(vr))
      })
  }

  /** Single mean-shift changepoint per key — "WHERE did the level
    * change?" (the localization companion of [[cusum]]'s when-did-it-
    * drift alarm: binary segmentation's first split): over the
    * x-ordered series, the best split k maximizes the scaled
    * between-means statistic, and with prefix sums P_k the whole
    * argmax clears to exact integers:
    * `G_k ∝ (n·P_k − k·S)² / (k·(n−k))` — numerator exact decimal,
    * FLOORED by the exact integer division (`div`, the [[graft
    * .operators.Robust.cramersV]] discipline; the floor shifts G by
    * < 1 against magnitudes ~10¹⁵ and cannot move the argmax except
    * across exact ties, which the deterministic (g desc, x asc)
    * tie-break already owns). Emits the split AFTER which the mean
    * changes, with both sides' exact sums so the caller reads the
    * means without re-scanning. Same unique-x / 2-dp contracts as
    * [[durbinWatson]]. BIGINT bound: (n·P)²/k(n−k) — at daily-count
    * scale ~10¹⁵; ANSI throws loudly past 9e18.
    *
    * Output per key: (key, n, split_x, left_n, left_sum_cents,
    * right_n, right_sum_cents, g_floor) — NULL-free for n ≥ 2; keys
    * with n < 2 are dropped (no interior split exists). */
  def changePointMeanShift(df: DataFrame, keyCol: String, xCol: String,
                           valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "changePointMeanShift: duplicate x within a key — " +
            "pre-aggregate to one row per (key, x)")))
          .otherwise(col("__v")))
      .drop("__cx")
    val tot = cells.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).cast("long").as("__s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
    val scored = cells.join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__p", sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .filter(col("__k") < col("__n")) // interior splits only
      .withColumn("__d",
        (col("__n").cast(d38) * col("__p")
          - col("__k").cast(d38) * col("__s")).cast(d38))
      .withColumn("g_floor",
        expr("(__d * __d) div (__k * (__n - __k))"))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(col("g_floor").desc, col("__x").asc)
    scored.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__n").cast("long").as("n"),
        col("__x").as("split_x"), col("__k").as("left_n"),
        col("__p").as("left_sum_cents"),
        (col("__n") - col("__k")).cast("long").as("right_n"),
        (col("__s") - col("__p")).cast("long").as("right_sum_cents"),
        col("g_floor").cast("long").as("g_floor"))
  }

  /** Ljung–Box portmanteau test per key — "is there ANY autocorrelation
    * in the first m lags?" ([[durbinWatson]] sees lag 1; this is the
    * standard joint whiteness check before trusting i.i.d.-assuming
    * statistics on a per-key series): `Q = n·(n+2)·Σ_{k≤m} r_k²/(n−k)`
    * with `r_k = Σ_t e_t·e_{t−k} / Σ_t e_t²` over the same exact
    * integral centering `e_t = n·x_t − Σx` as DW (scale-invariant: the
    * n· multiplier cancels in every ratio), so every numerator and the
    * shared denominator are exact BIGINTs — all m lag products ride
    * one (key, x-order) window shuffle. Lags are STEPS in x order (the
    * DW adjacency convention — gap-fill upstream if calendar lags are
    * meant); duplicate x raises; same 2-dp value contract. BIGINT
    * bound: |e| ≤ n·max_cents, so Σe·e' needs n³·max_cents² < 9e18 —
    * loud ANSI overflow past it.
    *
    * Output per (key, lag): (key, lag, n, acf_num, acf_den, r,
    * q_stat) — q_stat identical on a key's rows (the friedman
    * broadcast-attach convention), NULL when n ≤ maxLag or the series
    * is constant. */
  def ljungBox(df: DataFrame, keyCol: String, xCol: String,
               valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 32,
      s"maxLag must be in [1,32], got $maxLag")
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "ljungBox: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    val tot = cells.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).cast("long").as("__s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
    val lags = 1 to maxLag
    val e = cells.join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__e",
        (col("__n").cast(d38) * col("__v") - col("__s")).cast(d38))
    val withLags = lags.foldLeft(e) { (acc, k) =>
      acc.withColumn(s"__l$k", lag(col("__e"), k).over(w))
    }
    val numAggs = lags.map(k =>
      sum(when(col(s"__l$k").isNotNull, col("__e") * col(s"__l$k"))
        .otherwise(lit(0).cast(d38))).cast(d38).cast("long")
        .as(s"__num$k"))
    val agg = withLags.groupBy(col(keyCol))
      .agg(max(col("__n")).cast("long").as("n"),
        (sum(col("__e") * col("__e")).cast(d38).cast("long")
          .as("acf_den") +: numAggs): _*)
    // Q as ONE fixed left-to-right double expression over the exact
    // integer parts (never a float aggregation — summation order would
    // be engine/partition dependent; a literal t1+t2+…+tm tree is the
    // same IEEE chain in any engine)
    val terms = lags.map { k =>
      val r = col(s"__num$k").cast("double") / col("acf_den").cast("double")
      r * r / (col("n") - k).cast("double")
    }
    agg
      .withColumn("q_stat",
        when(col("n") > maxLag && col("acf_den") > 0,
          col("n").cast("double") * (col("n").cast("double") + 2.0)
            * terms.reduceLeft(_ + _)))
      .select(col(keyCol), col("n"), col("acf_den"),
        expr(s"stack(${maxLag}, " +
          lags.map(k => s"$k, __num$k").mkString(", ") +
          ") as (lag, acf_num)"), col("q_stat"))
      .withColumn("r",
        when(col("acf_den") > 0,
          col("acf_num").cast("double") / col("acf_den").cast("double")))
      .select(col(keyCol), col("lag"), col("n"), col("acf_num"),
        col("acf_den"), col("r"), col("q_stat"))
  }

  /** Exponentially weighted moving average per key — the classic
    * monitoring smoother `s_t = α·x_t + (1−α)·s_{t−1}`, seeded
    * `s_1 = x_1`. The recursion is ORDER-DEPENDENT (like the
    * Kaplan–Meier survival product, the one aggregate class that
    * cannot be an unordered fold), so it runs as an explicit ascending
    * left fold: `aggregate(collect_list(x) OVER running-frame)` with
    * the first element as the seed — and the oracle replicates the
    * SAME left fold via a recursive CTE, step arithmetic
    * `acc·(1−α) + x·α` written identically in both engines, so results
    * are bit-exact when α is dyadic (0.25, 0.5, …; a non-dyadic α
    * raises — its `1−α` rounding would be a silent cross-engine
    * hazard for the oracle contract, not for the math).
    *
    * Cost contract: the running collect_list is O(series²) per key —
    * fine on the pre-aggregated SERIES frames this operator is for
    * (daily/hourly rollups; the [[durbinWatson]] contract), wrong on
    * raw events. Duplicate (key, x-order) rows raise in-plan (a
    * second observation at the same instant makes the fold
    * order-dependent — the [[resampleLocf]] guard). NULL values
    * raise too: the fold has no skip rule; impute or drop upstream.
    *
    * Output: (key, <order col>, <value col>, ewma). */
  def ewma(df: DataFrame, keyCol: String, orderCol: String,
           valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    // dyadic check: alpha * 2^30 integral ⇒ alpha and 1−alpha exact
    require((alpha * (1L << 30)).isWhole,
      s"alpha must be dyadic (k/2^30) for the cross-engine fold, got $alpha")
    val beta = 1.0 - alpha
    val wDup = Window.partitionBy(col(keyCol), col(orderCol))
    val base = df
      .withColumn("__x",
        when(col(valueCol).isNotNull, col(valueCol).cast("double"))
          .otherwise(raise_error(concat(lit("ewma: NULL value at ("),
            col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"), lit(") — impute upstream")))))
      .withColumn("__x",
        when(count(lit(1)).over(wDup) > 1,
          raise_error(concat(lit("ewma: duplicate (key, order) at ("),
            col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"),
            lit(") — pre-aggregate the series"))))
          .otherwise(col("__x")))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__xs", collect_list(col("__x")).over(wRun))
      .withColumn("ewma",
        aggregate(
          slice(col("__xs"), lit(2),
            greatest(size(col("__xs")) - 1, lit(0))),
          element_at(col("__xs"), 1),
          (acc, x) => acc * lit(beta) + x * lit(alpha)))
      .drop("__x", "__xs")
  }

  /** Maximum drawdown per key — the risk classic: with the running
    * peak `P_t = max_{s≤t} x_s`, the drawdown at t is `P_t − x_t` and
    * the max drawdown is its maximum over the series. Two
    * key-partitioned windows over the pre-aggregated series (the
    * [[durbinWatson]] series contract), all exact integers in the
    * value's own units. Duplicate (key, order) raises (the running
    * max is order-dependent across ties of the SAME instant). Output
    * per key: (key, n, peak, max_drawdown, trough_order) —
    * trough_order is the FIRST order value attaining the max
    * drawdown. */
  def maxDrawdown(df: DataFrame, keyCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    val wDup = Window.partitionBy(col(keyCol), col(orderCol))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(valueCol).isNotNull)
      .withColumn("__x",
        when(count(lit(1)).over(wDup) > 1,
          raise_error(concat(lit("maxDrawdown: duplicate (key, order)" +
            " at ("), col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"),
            lit(") — pre-aggregate the series"))))
          .otherwise(col(valueCol).cast("long")))
      .withColumn("__peak", max(col("__x")).over(wRun))
      .withColumn("__dd", col("__peak") - col("__x"))
      .withColumn("__mdd",
        max(col("__dd")).over(Window.partitionBy(col(keyCol))))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        max(col("__x")).cast("long").as("peak"),
        max(col("__dd")).cast("long").as("max_drawdown"),
        min(when(col("__dd") === col("__mdd"), col(orderCol)))
          .as("trough_order"))
  }

  /** Holt's linear-trend smoother per key — [[ewma]]'s TWO-STATE
    * sibling (EWMA lags behind a trending series by construction;
    * Holt carries a level AND a trend):
    *
    *   `l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})`
    *   `b_t = γ·(l_t − l_{t−1}) + (1−γ)·b_{t−1}`
    *
    * seeded `l_1 = x_1, b_1 = 0` (the zero-trend seed — stated
    * contract; callers wanting the x_2−x_1 seed difference their
    * series upstream). Same ordered-left-fold machinery as [[ewma]]
    * with a STRUCT accumulator, and the same cross-engine contract:
    * both α and γ dyadic (raise otherwise), the oracle's recursive
    * CTE replays the identical IEEE chains — `b_t`'s reference to
    * `l_t` is textually repeated in both engines (same expression,
    * same doubles). Same guards (NULL value raises, duplicate
    * (key, order) raises) and the same O(series²)-per-key cost
    * contract (pre-aggregated series only).
    *
    * Output: input columns + (level, trend). */
  /** CUSUM change-point parts per key — "did the level SHIFT, and
    * where?": over the x-ordered series, the running sum of the
    * exact integrally-centered residuals `e_t = n·v_t − Σv` (the
    * [[durbinWatson]] centering — mean-free with zero rational
    * arithmetic) peaks in magnitude AT the change point under a
    * one-shift model (Page 1954's statistic, Pettitt's test uses the
    * rank analog). Emitted as parts: every column is an exact BIGINT
    * off the cents lattice — n, Σv (cents), max |S_t|, and the FIRST
    * x attaining it (deterministic tie rule) — the caller scales
    * (max|S| is n·cents-scaled) and applies its threshold outside the
    * hashed frame. Same cell contract as durbinWatson (cents grid,
    * duplicate-x raise); one window pass + two hash aggregates. */
  def cusumParts(df: DataFrame, keyCol: String, xCol: String,
                 valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "cusumParts: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    val tot = cells.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).cast("long").as("__s"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = cells.join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__e",
        (col("__n").cast(d38) * col("__v") - col("__s")).cast(d38))
      .withColumn("__cs", sum(col("__e")).over(wRun).cast(d38))
    val mx = scored.groupBy(col(keyCol))
      .agg(max(abs(col("__cs"))).cast(d38).cast("long")
        .as("max_abs_cusum"))
    scored.join(Broadcasts.maybeBroadcast(mx), Seq(keyCol))
      .filter(abs(col("__cs")).cast(d38).cast("long")
        === col("max_abs_cusum"))
      .groupBy(col(keyCol))
      .agg(min(col("__x")).as("argmax_x"),
        max(col("max_abs_cusum")).as("max_abs_cusum"),
        max(col("__n")).cast("long").as("n"),
        max(col("__s")).cast("long").as("sum_cents"))
  }

  /** Croston's method per key — the intermittent-demand smoother
    * (Croston 1972): zero-heavy series (spare parts, rare-event
    * volumes) break plain exponential smoothing, so demand SIZE and
    * demand INTERVAL smooth separately and only on demand periods:
    *
    *   demand (x > 0):  `z_t = α·x_t + (1−α)·z`, `p_t = α·q + (1−α)·p`,
    *                    `q → 1`
    *   no demand:       carry z and p, `q → q + 1`
    *
    * seeded at the FIRST demand with `z = x, p = q` (q periods since
    * series start — the first interval is observed, not guessed).
    * `forecast = z / p` is the per-period demand rate; rows before
    * the first demand emit NULLs. Same ordered-left-fold machinery,
    * dyadic-α / NULL / duplicate-order raises, O(series²) collect_list
    * frames, and recursive-CTE oracle contract as [[holtLinear]] —
    * the 4-field struct accumulator (z, p, q, seen) adds the counter
    * and the cold-start flag to the state. Values must be
    * non-negative (a negative demand has no Croston meaning —
    * raises). Output: input columns + (demand_level, interval_level,
    * forecast). */
  def croston(df: DataFrame, keyCol: String, orderCol: String,
              valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    require((alpha * (1L << 30)).isWhole, s"alpha must be dyadic, got $alpha")
    val beta = 1.0 - alpha
    val wDup = Window.partitionBy(col(keyCol), col(orderCol))
    val base = df
      .withColumn("__x",
        when(col(valueCol).isNull,
          raise_error(concat(lit("croston: NULL value at ("),
            col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"), lit(") — impute upstream"))))
          .when(col(valueCol) < 0,
            raise_error(concat(lit("croston: negative demand at ("),
              col(keyCol).cast("string"), lit(", "),
              col(orderCol).cast("string"), lit(")"))))
          .otherwise(col(valueCol).cast("double")))
      .withColumn("__x",
        when(count(lit(1)).over(wDup) > 1,
          raise_error(concat(lit("croston: duplicate (key, order) at ("),
            col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"),
            lit(") — pre-aggregate the series"))))
          .otherwise(col("__x")))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def step(acc: org.apache.spark.sql.Column,
             x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val q = acc.getField("q")
      val isDemand = x > lit(0.0)
      val z2 = when(!acc.getField("seen"), x)
        .otherwise(x * lit(alpha) + acc.getField("z") * lit(beta))
      val p2 = when(!acc.getField("seen"), q)
        .otherwise(q * lit(alpha) + acc.getField("p") * lit(beta))
      when(isDemand,
        struct(z2.as("z"), p2.as("p"), lit(1.0).as("q"),
          lit(true).as("seen")))
        .otherwise(struct(acc.getField("z").as("z"),
          acc.getField("p").as("p"), (q + lit(1.0)).as("q"),
          acc.getField("seen").as("seen")))
    }
    base
      .withColumn("__xs", collect_list(col("__x")).over(wRun))
      .withColumn("__st",
        aggregate(col("__xs"),
          struct(lit(null).cast("double").as("z"),
            lit(null).cast("double").as("p"),
            lit(1.0).as("q"), lit(false).as("seen")),
          step))
      .withColumn("demand_level", col("__st").getField("z"))
      .withColumn("interval_level", col("__st").getField("p"))
      .withColumn("forecast",
        col("__st").getField("z") / col("__st").getField("p"))
      .drop("__x", "__xs", "__st")
  }

  def holtLinear(df: DataFrame, keyCol: String, orderCol: String,
                 valueCol: String, alpha: Double,
                 gamma: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    require(gamma > 0.0 && gamma <= 1.0, s"gamma in (0,1], got $gamma")
    require((alpha * (1L << 30)).isWhole && (gamma * (1L << 30)).isWhole,
      s"alpha and gamma must be dyadic, got $alpha / $gamma")
    val beta = 1.0 - alpha
    val delta = 1.0 - gamma
    val wDup = Window.partitionBy(col(keyCol), col(orderCol))
    val base = df
      .withColumn("__x",
        when(col(valueCol).isNotNull, col(valueCol).cast("double"))
          .otherwise(raise_error(concat(lit("holtLinear: NULL value at ("),
            col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"), lit(") — impute upstream")))))
      .withColumn("__x",
        when(count(lit(1)).over(wDup) > 1,
          raise_error(concat(lit("holtLinear: duplicate (key, order)" +
            " at ("), col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"),
            lit(") — pre-aggregate the series"))))
          .otherwise(col("__x")))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def step(acc: org.apache.spark.sql.Column,
             x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val lNew = x * lit(alpha) + (acc.getField("l") + acc.getField("b")) *
        lit(beta)
      val bNew = (lNew - acc.getField("l")) * lit(gamma) +
        acc.getField("b") * lit(delta)
      struct(lNew.as("l"), bNew.as("b"))
    }
    base
      .withColumn("__xs", collect_list(col("__x")).over(wRun))
      .withColumn("__st",
        aggregate(
          slice(col("__xs"), lit(2),
            greatest(size(col("__xs")) - 1, lit(0))),
          struct(element_at(col("__xs"), 1).as("l"), lit(0.0).as("b")),
          step))
      .withColumn("level", col("__st").getField("l"))
      .withColumn("trend", col("__st").getField("b"))
      .drop("__x", "__xs", "__st")
  }

  /** Holt–Winters ADDITIVE smoother per key — the THREE-state member
    * completing the exponential family ([[ewma]] level,
    * [[holtLinear]] level+trend, here level+trend+`period` seasonal
    * slots):
    *
    *   `l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})`
    *   `b_t = γ·(l_t − l_{t−1}) + (1−γ)·b_{t−1}`
    *   `s_t = δ·(x_t − l_t) + (1−δ)·s_{t−m}`
    *
    * seeded `l_1 = x_1, b_1 = 0, s = 0⃗` (the cold-start seed — stated
    * contract; production initializations fit the first season
    * upstream). The seasonal slot of position p (1-based, per key) is
    * `(p−1) mod period` — slots live as `period` struct fields in the
    * fold accumulator, selected and updated by when-chains, so the
    * whole state stays one expression-level struct (no arrays, no
    * UDFs). Same dyadic/guard/O(series²)/oracle-replay contract as
    * [[holtLinear]] — the oracle's recursive CTE carries the m season
    * columns and repeats the `l_t` expression textually inside `b_t`
    * and `s_t`, exactly as the fold lambda does.
    *
    * Output: input columns + (level, trend, season) — `season` is the
    * row's own slot AFTER its update. */
  def holtWinters(df: DataFrame, keyCol: String, orderCol: String,
                  valueCol: String, alpha: Double, gamma: Double,
                  delta: Double, period: Int): DataFrame = {
    require(period >= 2 && period <= 24,
      s"period in [2, 24], got $period")
    Seq(("alpha", alpha), ("gamma", gamma), ("delta", delta)).foreach {
      case (n, v) =>
        require(v > 0.0 && v <= 1.0, s"$n in (0,1], got $v")
        require((v * (1L << 30)).isWhole, s"$n must be dyadic, got $v")
    }
    val (beta, gbar, dbar) = (1.0 - alpha, 1.0 - gamma, 1.0 - delta)
    val wDup = Window.partitionBy(col(keyCol), col(orderCol))
    val base = df
      .withColumn("__x",
        when(col(valueCol).isNotNull, col(valueCol).cast("double"))
          .otherwise(raise_error(concat(lit("holtWinters: NULL value" +
            " at ("), col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"), lit(") — impute upstream")))))
      .withColumn("__x",
        when(count(lit(1)).over(wDup) > 1,
          raise_error(concat(lit("holtWinters: duplicate (key," +
            " order) at ("), col(keyCol).cast("string"), lit(", "),
            col(orderCol).cast("string"),
            lit(") — pre-aggregate the series"))))
          .otherwise(col("__x")))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    type C = org.apache.spark.sql.Column
    def slotOf(p: C): C = (p - 1) % period
    def pick(st: C, slot: C): C =
      (0 until period).foldLeft(lit(Double.NaN)) { (acc, j) =>
        when(slot === j, st.getField(s"s$j")).otherwise(acc)
      }
    def step(acc: C, x: C): C = {
      val p = acc.getField("t") + 1
      val slot = slotOf(p)
      val sCur = pick(acc, slot)
      val lNew = (x - sCur) * lit(alpha) +
        (acc.getField("l") + acc.getField("b")) * lit(beta)
      val bNew = (lNew - acc.getField("l")) * lit(gamma) +
        acc.getField("b") * lit(gbar)
      val sFields = (0 until period).map { j =>
        when(slot === j,
          (x - lNew) * lit(delta) + acc.getField(s"s$j") * lit(dbar))
          .otherwise(acc.getField(s"s$j")).as(s"s$j")
      }
      struct((lNew.as("l") +: bNew.as("b") +: sFields) :+ p.as("t"): _*)
    }
    val seed = struct(
      (element_at(col("__xs"), 1).as("l") +: lit(0.0).as("b") +:
        (0 until period).map(j => lit(0.0).as(s"s$j"))) :+
        lit(1L).as("t"): _*)
    base
      .withColumn("__xs", collect_list(col("__x")).over(wRun))
      .withColumn("__st",
        aggregate(
          slice(col("__xs"), lit(2),
            greatest(size(col("__xs")) - 1, lit(0))),
          seed, step))
      .withColumn("level", col("__st").getField("l"))
      .withColumn("trend", col("__st").getField("b"))
      .withColumn("season",
        pick(col("__st"), slotOf(size(col("__xs")).cast("long"))))
      .drop("__x", "__xs", "__st")
  }

  /** Piecewise Aggregate Approximation (PAA, Keogh et al. 2001) — the
    * dimensionality reducer behind every SAX/iSAX series index: a
    * length-n series per key collapses to `nSeg` segment means, each
    * segment covering `⌊(rn−1)·nSeg/n⌋` (the standard equi-width
    * assignment, exact in integer arithmetic — no float boundary).
    * At 100 TB of series this is the admission step that turns
    * billions of raw points into fixed-width signatures a similarity
    * index can bucket (see [[saxWords]]).
    *
    * Exactness: values go through the cents lattice
    * (`decimal(12,2)·100 → long`, the [[cusumParts]] convention);
    * per-segment `sum_cents`/`seg_n` are exact BIGINTs and
    * `mean_cents` ONE IEEE division of exact integers — the oracle
    * mirrors all three. Duplicate x within a key raises (the
    * [[graft.operators.RankStats.mannKendall]] rule); a series
    * shorter than `nSeg` raises (PAA is a REDUCTION — asking for
    * more segments than points is a caller bug, not padding).
    * Output: (key, seg, seg_start_x, seg_n, sum_cents, mean_cents).
    * One row_number window per key + one aggregate — scales as any
    * keyed window. */
  def paa(df: DataFrame, keyCol: String, xCol: String, valueCol: String,
          nSeg: Int): DataFrame = {
    require(nSeg >= 1, s"nSeg must be >= 1, got $nSeg")
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "paa: duplicate x within a key — pre-aggregate to one row " +
            "per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    val tot = cells.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
    cells.join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__n",
        when(col("__n") < nSeg, raise_error(lit(
          s"paa: series shorter than nSeg=$nSeg — PAA reduces, " +
            "never pads"))).otherwise(col("__n")))
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      // integer division (Spark's `/` on longs is DOUBLE division)
      .withColumn("seg", expr(s"(__rn - 1) * $nSeg DIV __n"))
      .groupBy(col(keyCol), col("seg"))
      .agg(min(col("__x")).as("seg_start_x"),
        count(lit(1)).as("seg_n"),
        sum(col("__v")).cast("long").as("sum_cents"))
      .withColumn("mean_cents",
        col("sum_cents").cast("double") / col("seg_n").cast("double"))
  }

  /** SAX words (Lin et al. 2003) in the engine's RANK form: each
    * series ([[paa]]-reduced to `nSeg` segment means) symbolizes
    * against per-SCOPE empirical quantile cutpoints instead of the
    * classic z-normalize + Gaussian breakpoints — rank cutpoints are
    * EXACT on the cents lattice (the
    * [[graft.operators.RankStats]] distinct-value-lattice doctrine),
    * so no libm (mean/stddev) ever enters a compared column, and the
    * symbols are invariant to any monotone value transform.
    *
    * Cutpoint k (k = 1…alphabet−1) per scope is the smallest lattice
    * value with `alphabet·cum_cnt ≥ k·n` over the scope's raw
    * points; a segment's symbol is the count of cutpoints its mean
    * exceeds, decided by the cross-multiplied exact predicate
    * `sum_cents > c_k·seg_n` (a rational mean never touches a
    * float). The word is the in-order symbol string — identical
    * words = identical coarse shapes, so a plain `GROUP BY word`
    * does motif discovery and near-pattern dedup at corpus scale
    * (the iSAX indexing substrate).
    *
    * `scopeCols ⊆ seriesCols` defines where cutpoints pool (e.g.
    * cutpoints per event_type, one word per (event_type, week)).
    * Output: (seriesCols…, word). Costs [[paa]] + one lattice
    * aggregate per scope + one bounded (≤nSeg) word fold per series.
    * Raises: [[paa]]'s rules; alphabet 2–8 (symbols are single
    * letters a…h). */
  def saxWords(df: DataFrame, seriesCols: Seq[String], xCol: String,
               valueCol: String, scopeCols: Seq[String], nSeg: Int,
               alphabet: Int): DataFrame = {
    require(alphabet >= 2 && alphabet <= 8,
      s"alphabet must be in [2, 8], got $alphabet")
    require(seriesCols.nonEmpty, "seriesCols required")
    require(scopeCols.nonEmpty && scopeCols.forall(seriesCols.contains),
      s"scopeCols must be a subset of seriesCols")
    // composite series key for paa (paa takes ONE key column)
    val keyed = df.withColumn("__series",
      concat_ws("\u0001", seriesCols.map(c => col(c).cast("string")): _*))
    val segs = paa(keyed, "__series", xCol, valueCol, nSeg)
      .join(keyed.select((seriesCols :+ "__series").map(col): _*).distinct(),
        Seq("__series"))
    // per-scope raw-value lattice -> alphabet-1 rank cutpoints
    val cells = keyed
      .filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col("__series"), col(xCol))
      .agg(max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
        .as("__v"))
      .join(keyed.select((seriesCols :+ "__series").map(col): _*).distinct(),
        Seq("__series"))
    val lat = cells.groupBy(scopeCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(scopeCols.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(scopeCols.map(col): _*)
    val cuts = lat
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__tot", sum(col("__c")).over(wAll))
      .groupBy(scopeCols.map(col): _*)
      .agg(
        min(when(lit(alphabet) * col("__cum") >= col("__tot"),
          col("__v"))).as("__cut1"),
        (2 until alphabet).map(kk =>
          min(when(lit(alphabet) * col("__cum") >= lit(kk) * col("__tot"),
            col("__v"))).as(s"__cut$kk")): _*)
    val symbol = (1 until alphabet)
      .map(kk => when(col("sum_cents") > col(s"__cut$kk") * col("seg_n"),
        1).otherwise(0))
      .reduce(_ + _)
    segs.join(Broadcasts.maybeBroadcast(cuts), scopeCols)
      .withColumn("__sym",
        element_at(array("abcdefgh".map(ch => lit(ch.toString)): _*),
          symbol + 1))
      .groupBy(seriesCols.map(col): _*)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("seg"), col("__sym")))),
          x => x.getField("__sym")), "").as("word"))
  }

  /** Pairwise DTW (dynamic time warping) distance matrix with a
    * Sakoe–Chiba band — the alignment-tolerant series distance
    * Euclidean point-wise comparison can't give (two identical
    * shapes shifted by a day are "far" point-wise, near under DTW).
    * Every unordered key pair gets the exact banded DTW cost over
    * the cents lattice:
    *
    *   dp(i,j) = |aᵢ − bⱼ| + min(dp(i−1,j), dp(i−1,j−1), dp(i,j−1)),
    *   cells with |i − j| > band are walled off (Sakoe–Chiba 1978).
    *
    * All-integer arithmetic: costs are exact cents BIGINTs, the wall
    * a saturating sentinel (min keeps it stable, never overflows) —
    * so the distance is EXACT and the DuckDB oracle replays the
    * identical DP cell-for-cell (a recursive wavefront over the
    * linearized table). The fold is one whole-stage expression per
    * pair (an ordered `aggregate` over rows carrying the previous DP
    * row — no driver loop, no UDF); pairs evaluate independently, so
    * the matrix distributes across the cluster like any join.
    *
    * Scale posture: per-pair cost is O(n·m) cells on rows that hold
    * both series — this is the SHORT-SERIES distance (calendar
    * series, profile curves). For long series compose with [[paa]]
    * first (the standard PAA→DTW reduction: 10⁴ points → 32 segment
    * means → DTW on 32), which is also what keeps the keys²
    * pair fan-out payable: pair enumeration is series-count scale,
    * never point scale, and the crossed frame carries the explicit
    * broadcast declaration ([[graft.operators.PlanAudit]] contract).
    * Raises: duplicate x (the [[paa]] rule); `band < |n_a − n_b|`
    * (the corner is unreachable — a caller bug, not an INF answer).
    * Output: (key_a, key_b, n_a, n_b, dtw_cents). */
  def dtwMatrix(df: DataFrame, keyCol: String, xCol: String,
                valueCol: String, band: Int): DataFrame =
    dtwPairs(df, keyCol, xCol, valueCol, band)
      .select("key_a", "key_b", "n_a", "n_b", "dtw_cents")

  /** [[dtwMatrix]]'s pair frame WITH the series arrays still aboard —
    * the shared substrate [[dtwWithLbKeogh]] builds its envelope
    * bound on. */
  private def dtwPairs(df: DataFrame, keyCol: String, xCol: String,
                       valueCol: String, band: Int): DataFrame = {
    val ser = dtwSeries(df, keyCol, xCol, valueCol)
    val a = ser.select(col(keyCol).as("key_a"), col("arr").as("__a"),
      col("n").as("n_a"))
    val b = ser.select(col(keyCol).as("key_b"), col("arr").as("__b"),
      col("n").as("n_b"))
    a.crossJoin(broadcast(b))
      .filter(col("key_a") < col("key_b"))
      .withColumn("n_a",
        when(abs(col("n_a") - col("n_b")) > band, raise_error(lit(
          s"dtwMatrix: band $band < |n_a - n_b| — the (n, m) corner " +
            "is unreachable; widen the band or length-align the series")))
          .otherwise(col("n_a")))
      .withColumn("dtw_cents", guardDtw(expr(dtwDpSql(band))))
  }

  /** One (key, n, value-array) row per series — the cents-lattice
    * array substrate of the DTW family (duplicate-x raises). */
  private def dtwSeries(df: DataFrame, keyCol: String, xCol: String,
                        valueCol: String): DataFrame = {
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "dtwMatrix: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    cells.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        transform(array_sort(collect_list(struct(col("__x"), col("__v")))),
          x => x.getField("__v")).as("arr"))
  }

  private val dtwInf = 1000000000000000L // saturating wall: INF+cost < 2^63

  /** Sentinel guard on a finished DP distance (round-13 ADVICE): the
    * band-wall `require` already guarantees the (n, m) corner is
    * REACHABLE, so the returned distance equalling the saturating
    * sentinel can only mean a genuine path cost hit 10¹⁵ cents and
    * was silently clamped (possible for decimal(12,2) values near the
    * cap over a few hundred points) — indistinguishable from a
    * banding wall and therefore WRONG to return. Raise instead; the
    * caller rescales or [[paa]]-reduces. */
  private def guardDtw(dp: Column): Column =
    when(dp === dtwInf, raise_error(lit(
      "dtw: distance reached the saturating sentinel — the exact " +
        "path cost clamped at 10^15 cents (input magnitude x length " +
        "over budget); rescale the values or paa-reduce the series")))
      .otherwise(dp)

  /** The banded DP as one SQL expression over (__a, __b, n_a, n_b). */
  private def dtwDpSql(band: Int): String = {
    require(band >= 0, s"band must be >= 0, got $band")
    s"""element_at(
       |  aggregate(
       |    sequence(1L, n_a),
       |    concat(array(0L), transform(sequence(1L, n_b), j -> ${dtwInf}L)),
       |    (prev, i) -> aggregate(
       |      sequence(1L, n_b),
       |      array(${dtwInf}L),
       |      (acc, j) -> concat(acc, array(
       |        CASE WHEN abs(i - j) > $band THEN ${dtwInf}L
       |             ELSE least(
       |               abs(element_at(__a, CAST(i AS INT))
       |                   - element_at(__b, CAST(j AS INT)))
       |                 + least(element_at(prev, CAST(j + 1 AS INT)),
       |                         element_at(prev, CAST(j AS INT)),
       |                         element_at(acc, size(acc))),
       |               ${dtwInf}L) END)))),
       |  CAST(n_b + 1 AS INT))""".stripMargin
  }

  /** [[dtwMatrix]] with the LB_Keogh lower bound (Keogh &
    * Ratanamahatana 2005) beside the exact distance — the pruning
    * primitive of every real DTW index: the bound needs only the
    * banded ENVELOPE of one series (per position, the min/max over
    * `[j−band, j+band]`) and one linear pass
    * `Σ max(0, aⱼ−Uⱼ, Lⱼ−aⱼ)`, O(n·band) versus the DP's O(n·m) —
    * at corpus scale a search computes cheap bounds for every
    * candidate and runs the full DP only where the bound beats the
    * current best (here both are emitted and the bound's soundness
    * `lb ≤ dtw` is enforced IN-PLAN — a violated bound raises, so
    * the pruning contract is load-bearing, not a comment). Equal
    * lengths required (the aligned-envelope form; [[paa]]-reduce to
    * a common width first). Output: (key_a, key_b, n, lb_cents,
    * dtw_cents). */
  def dtwWithLbKeogh(df: DataFrame, keyCol: String, xCol: String,
                     valueCol: String, band: Int): DataFrame = {
    dtwPairs(df, keyCol, xCol, valueCol, band)
      .withColumn("n_a",
        when(col("n_a") =!= col("n_b"), raise_error(lit(
          "dtwWithLbKeogh: LB_Keogh's aligned envelope needs equal " +
            "lengths — paa-reduce to a common width first")))
          .otherwise(col("n_a")))
      .withColumn("lb_cents", expr(dtwLbSql(band)))
      .withColumn("lb_cents",
        when(col("lb_cents") > col("dtw_cents"), raise_error(lit(
          "dtwWithLbKeogh: lower bound exceeded the exact distance — " +
            "the pruning contract is broken (engine bug)")))
          .otherwise(col("lb_cents")))
      .select(col("key_a"), col("key_b"), col("n_a").as("n"),
        col("lb_cents"), col("dtw_cents"))
  }

  /** LB_Keogh as one SQL expression over (__a, __b, n_a, n_b). */
  private def dtwLbSql(band: Int): String =
    s"""aggregate(
       |  sequence(1L, n_a),
       |  0L,
       |  (acc, j) -> acc + greatest(
       |    0L,
       |    element_at(__a, CAST(j AS INT))
       |      - array_max(slice(__b,
       |          CAST(greatest(1L, j - $band) AS INT),
       |          CAST(least(n_b, j + $band)
       |            - greatest(1L, j - $band) + 1 AS INT))),
       |    array_min(slice(__b,
       |        CAST(greatest(1L, j - $band) AS INT),
       |        CAST(least(n_b, j + $band)
       |          - greatest(1L, j - $band) + 1 AS INT)))
       |      - element_at(__a, CAST(j AS INT))))""".stripMargin

  /** Pruned DTW top-k search — the LB_Keogh bound doing its real
    * job: for every query series, the k nearest corpus series by
    * exact banded DTW, computed WITHOUT running the DP against the
    * whole corpus. Three stages, each a provable superset of the
    * answer:
    *
    *  1. bounds: LB_Keogh for every (query, candidate) pair — the
    *     O(n·band) linear pass;
    *  2. seeds: the k best candidates BY BOUND get exact DTW; their
    *     kth exact distance τ upper-bounds the true kth-nearest
    *     (k seeds already sit at ≤ τ);
    *  3. exact: only pairs with `lb ≤ τ` run the DP — every true
    *     top-k member has `lb ≤ dtw ≤ kth ≤ τ`, so none is pruned
    *     (the q433/q487 overfetch-then-rerank discipline with a
    *     PROVABLE bound instead of a recall floor).
    *
    * The result is REQUIRED identical to the brute-force matrix by
    * construction; pin it in calling code with [[dtwMatrix]] when
    * the corpus is small enough to afford it (q516 does). Both heap
    * selections run on [[graft.operators.TopK.perKey]] — no sort.
    * Equal lengths required (the envelope form). Output:
    * (query_key, neighbor, rank, lb_cents, dtw_cents). */
  def dtwTopK(df: DataFrame, keyCol: String, xCol: String,
              valueCol: String, band: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ser = dtwSeries(df, keyCol, xCol, valueCol)
    val q = ser.select(col(keyCol).as("query_key"), col("arr").as("__a"),
      col("n").as("n_a"))
    val c = ser.select(col(keyCol).as("neighbor"), col("arr").as("__b"),
      col("n").as("n_b"))
    val pairs = q.crossJoin(broadcast(c))
      .filter(col("query_key") =!= col("neighbor"))
      .withColumn("n_a",
        when(col("n_a") =!= col("n_b"), raise_error(lit(
          "dtwTopK: LB_Keogh's aligned envelope needs equal lengths " +
            "— paa-reduce to a common width first")))
          .otherwise(col("n_a")))
      .withColumn("lb_cents", expr(dtwLbSql(band)))
    val seeds = graft.operators.TopK.perKey(pairs, Seq("query_key"),
      Seq(("lb_cents", true), ("neighbor", true)), k)
    val tau = seeds.withColumn("__dtw", guardDtw(expr(dtwDpSql(band))))
      .groupBy(col("query_key"))
      .agg(max(col("__dtw")).as("__tau"))
    val survivors = pairs
      .join(Broadcasts.maybeBroadcast(tau), Seq("query_key"))
      .filter(col("lb_cents") <= col("__tau"))
      .withColumn("dtw_cents", guardDtw(expr(dtwDpSql(band))))
    val top = graft.operators.TopK.perKey(survivors, Seq("query_key"),
      Seq(("dtw_cents", true), ("neighbor", true)), k)
    top.withColumn("rank",
        row_number().over(Window.partitionBy(col("query_key"))
          .orderBy(col("dtw_cents").asc, col("neighbor").asc))
          .cast("int"))
      .select("query_key", "neighbor", "rank", "lb_cents", "dtw_cents")
  }

  /** BLOCKED exact DTW top-k — [[dtwTopK]] without the all-pairs
    * bound stage (round-13, VERDICT #2): at corpus scale even the
    * O(n·band) LB_Keogh pass over every (query, candidate) pair is
    * S² work on a broadcast corpus. This variant generates candidates
    * through an EQUI-JOIN on a discrete grid key with a PROVABLE
    * cover guarantee, so the answer is still REQUIRED identical to
    * the brute-force matrix while bound evaluations stay strictly
    * below S² whenever the grid prunes anything. The ladder (each
    * rung a provable superset of the true top-k):
    *
    *  1. τ per query: candidates sharing the query's first-segment
    *     grid cell (plus a deterministic k+1-key fill for queries
    *     with thin blocks) get the aligned-L1 UPPER bound
    *     (the diagonal DP path: `Σ|qᵢ−cᵢ| ≥ DTW_band` for any band
    *     including the diagonal); the k-th smallest UB of ANY ≥k
    *     candidates upper-bounds the true k-th-nearest DTW — τ needs
    *     no quality from the blocking, only size.
    *  2. Candidate cover: for equal-width PAA segments with the
    *     BANDED query envelope (Û_j = max U over the segment's
    *     indices, L̂_j = min L), each segment alone lower-bounds the
    *     distance: `DTW ≥ max(0, S_j(c) − len_j·Û_j, len_j·L̂_j −
    *     S_j(c))` (the L1 form of Keogh's LB_PAA, per-segment). So a
    *     candidate with DTW ≤ τ must have its first-segment sum in
    *     `[len·L̂₁ − τ, len·Û₁ + τ]` — the query enumerates exactly
    *     the grid cells overlapping that interval (`sequence` +
    *     `explode`) and equi-joins candidates on `floor(S₁/cell)`.
    *     Never a cross join; candidate volume is interval/cellCents
    *     cells per query.
    *  3. LB_PAA over ALL segments prunes survivors > τ (exact
    *     BIGINT arithmetic on segment sums — no means, no floats).
    *  4. LB_Keogh (the [[dtwWithLbKeogh]] bound) prunes the rest > τ.
    *  5. The exact banded DP runs only on what remains; the per-query
    *     bottom-k by (dtw, neighbor) is the true top-k because every
    *     true member has DTW ≤ kth-best ≤ τ and therefore survived
    *     every rung.
    *
    * Equal lengths required (the envelope form — [[paa]]-reduce long
    * series first, the q524 composition). `cellCents` sets the grid
    * pitch on the first-segment CENTS-SUM scale: correctness never
    * depends on it, candidate volume does (small cells → more probe
    * cells per query, large cells → fatter blocks). Output:
    * (query_key, neighbor, rank, lb_cents, dtw_cents) — [[dtwTopK]]'s
    * schema, pinned REQUIRED-identical to it (and so to the brute
    * matrix) in q526. */
  def dtwTopKBlocked(df: DataFrame, keyCol: String, xCol: String,
                     valueCol: String, band: Int, k: Int, nSeg: Int,
                     cellCents: Long): DataFrame =
    dtwTopKBlockedWithCands(df, keyCol, xCol, valueCol, band, k, nSeg,
      cellCents)._1

  /** [[dtwTopKBlocked]] plus its stage-2 candidate frame — the
    * package-private instrumentation the spec uses to prove bound
    * evaluations stay strictly below S² (the whole point of the
    * blocked variant). */
  private[graft] def dtwTopKBlockedWithCands(
      df: DataFrame, keyCol: String, xCol: String, valueCol: String,
      band: Int, k: Int, nSeg: Int, cellCents: Long)
      : (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nSeg >= 1, s"nSeg must be >= 1, got $nSeg")
    require(cellCents >= 1, s"cellCents must be >= 1, got $cellCents")
    val ser = dtwSeries(df, keyCol, xCol, valueCol)
      .select(col(keyCol).as("key"), col("n"), col("arr"))
    // per-series segment stats: exact sums + BANDED-envelope bounds
    // (u_bound = len_j * max(arr[lo_j−band .. hi_j+band]), the Û side)
    val pts = ser.select(col("key"), col("n"),
        posexplode(col("arr")).as(Seq("pos", "v")))
      .withColumn("seg", expr(s"pos * $nSeg DIV n"))
    val segs = pts.groupBy(col("key"), col("seg"))
      .agg(sum(col("v")).cast("long").as("s_sum"),
        min(col("pos")).as("lo0"), max(col("pos")).as("hi0"),
        count(lit(1)).as("seg_len"))
    def envSlice = {
      val start = greatest(lit(1L), col("lo0") - band + 1L)
      val end = least(col("n"), col("hi0") + band + 1L)
      slice(col("arr"), start.cast("int"),
        (end - start + 1L).cast("int"))
    }
    val segB = segs
      .join(Broadcasts.maybeBroadcast(ser), Seq("key"))
      .withColumn("u_bound", col("seg_len") * array_max(envSlice))
      .withColumn("l_bound", col("seg_len") * array_min(envSlice))
    def vec(c: String) = transform(
      array_sort(collect_list(struct(col("seg"), col(c)))),
      x => x.getField(c))
    val segVec = segB.groupBy(col("key"))
      .agg(vec("s_sum").as("ssums"), vec("u_bound").as("ubounds"),
        vec("l_bound").as("lbounds"))
    // exact long floor-division (SQL DIV truncates toward zero, so
    // negative sums need the pmod form; doubles could disagree at a
    // cell boundary between the probe range and the candidate key)
    def cellOf(v: Column): Column = {
      // (v - pmod) is exactly divisible, so truncating DIV == floor;
      // stays in long arithmetic end to end (Spark's `/` on longs is
      // double division — lossy past 2^53)
      val floored = v - pmod(v, lit(cellCents))
      call_function("div", floored, lit(cellCents)).cast("long")
    }
    // TOTAL equal-length guard (round-14 ADVICE): the per-pair
    // raise_error used to ride a column the next select dropped, so
    // the optimizer could prune it, and zip_with's null-padding of
    // unequal arrays could flow a NULL ub into a silently-thin τ /
    // candidate cover. The global distinct-length count instead rides
    // `cell0` — the equi-join KEY of both stages, evaluated for every
    // series row whenever any candidate exists — so mixed-length
    // input ALWAYS raises, never silently drops pairs.
    val lenChk = ser.agg(count_distinct(col("n")).cast("long")
      .as("__nlen"))
    val base = ser.join(Broadcasts.maybeBroadcast(segVec), Seq("key"))
      .crossJoin(broadcast(lenChk))
      .withColumn("cell0",
        when(col("__nlen") > 1, raise_error(lit(
          "dtwTopKBlocked: the envelope/aligned-UB form needs equal " +
            "lengths — the series frame holds multiple distinct " +
            "lengths; paa-reduce to a common width first"))
          .cast("long"))
        .otherwise(cellOf(element_at(col("ssums"), 1))))
      .drop("__nlen")
    val q = base.select(col("key").as("query_key"), col("n").as("n_a"),
      col("arr").as("__a"), col("ubounds").as("__qu"),
      col("lbounds").as("__ql"), col("cell0"))
    val c = base.select(col("key").as("neighbor"), col("n").as("n_b"),
      col("arr").as("__b"), col("ssums").as("__cs"), col("cell0"))
    val ubExpr = expr(
      "aggregate(zip_with(__a, __b, (x, y) -> abs(x - y)), 0L, " +
        "(acc, d) -> acc + d)")
    // stage 1: τ from same-cell candidates + deterministic fill
    val sameBlock = q.join(c, Seq("cell0"))
      .filter(col("query_key") =!= col("neighbor"))
      .withColumn("ub", ubExpr)
      .select("query_key", "neighbor", "ub")
    val blockCnt = sameBlock.groupBy(col("query_key"))
      .agg(count(lit(1)).as("__nb"))
    val deficient = q
      .join(Broadcasts.maybeBroadcast(blockCnt), Seq("query_key"), "left")
      .filter(coalesce(col("__nb"), lit(0L)) < k)
      .select(col("query_key"), col("n_a"), col("__a"))
    val fillKeys = broadcast(
      c.orderBy(col("neighbor").asc).limit(k + 1)
        .select(col("neighbor"), col("n_b"), col("__b")))
    val fillUb = deficient.crossJoin(fillKeys)
      .filter(col("query_key") =!= col("neighbor"))
      .withColumn("ub", ubExpr)
      .select("query_key", "neighbor", "ub")
    val tauSeed = graft.operators.TopK.perKey(
      sameBlock.unionByName(fillUb).groupBy(col("query_key"),
          col("neighbor")).agg(min(col("ub")).as("ub")),
      Seq("query_key"), Seq(("ub", true), ("neighbor", true)), k)
    val tau = tauSeed.groupBy(col("query_key"))
      .agg(max(col("ub")).as("__tau"))
    // stage 2: the provable candidate cover — probe cells overlapping
    // [len·L̂₁ − τ, len·Û₁ + τ], equi-join on the candidates' cell
    val probes = q.drop("cell0")
      .join(Broadcasts.maybeBroadcast(tau), Seq("query_key"))
      .withColumn("cell0", explode(sequence(
        cellOf(element_at(col("__ql"), 1) - col("__tau")),
        cellOf(element_at(col("__qu"), 1) + col("__tau")))))
    val cands = probes.join(c, Seq("cell0"))
      .filter(col("query_key") =!= col("neighbor"))
    // stage 3: LB_PAA (all segments, exact BIGINTs)
    val lbPaa = expr(
      "aggregate(sequence(1, size(__cs)), 0L, (acc, j) -> acc + " +
        "greatest(0L, element_at(__cs, j) - element_at(__qu, j), " +
        "element_at(__ql, j) - element_at(__cs, j)))")
    val afterPaa = cands.withColumn("__lb_paa", lbPaa)
      .filter(col("__lb_paa") <= col("__tau"))
    // stage 4: LB_Keogh; stage 5: exact DP on the remainder
    val afterKeogh = afterPaa
      .withColumn("lb_cents", expr(dtwLbSql(band)))
      .filter(col("lb_cents") <= col("__tau"))
      .withColumn("dtw_cents", guardDtw(expr(dtwDpSql(band))))
    val top = graft.operators.TopK.perKey(afterKeogh, Seq("query_key"),
      Seq(("dtw_cents", true), ("neighbor", true)), k)
    val out = top.withColumn("rank",
        row_number().over(Window.partitionBy(col("query_key"))
          .orderBy(col("dtw_cents").asc, col("neighbor").asc))
          .cast("int"))
      .select("query_key", "neighbor", "rank", "lb_cents", "dtw_cents")
    (out, cands.select("query_key", "neighbor"))
  }

  /** Classical additive seasonal decomposition in EXACT RATIONAL
    * PARTS — trend = centered `period`-point moving average, seasonal
    * index = per-slot mean of the detrended series, remainder = the
    * rest; the textbook method (the moving-average half of STL)
    * with every component carried as (numerator, denominator)
    * integers instead of floats, so the identity
    *
    *   `v·p·sd = trend_num·sd + seas_num·p + resid_num`
    *
    * holds EXACTLY row-for-row (p = period, sd = the slot's seasonal
    * denominator p·slot_count) and the DuckDB oracle hash-matches
    * with zero float drift. Positional slots (`(row − 1) % period`)
    * — the series must be regularly sampled (gap-fill first with
    * [[fillDaily]]-class repair if not); `period` must be odd (the
    * centered window is symmetric; even periods need the 2×m
    * convention — not offered rather than approximated). Seasonal
    * indices are NOT centered (slot counts differ on partial cycles,
    * so centering would force per-key denominator products; center
    * consumer-side if needed — documented trade-off). Rows without a
    * full trend window (the first/last (p−1)/2) are omitted, as the
    * textbook method does. One row_number window + one rows-frame
    * sum + one slot aggregate per key — scales as any keyed window.
    * Output: (key, x, slot, v_cents, trend_num, seas_num, seas_den,
    * resid_num, resid_den). */
  def classicalDecompose(df: DataFrame, keyCol: String, xCol: String,
                         valueCol: String, period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (centered window), got $period")
    val h = (period - 1) / 2
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("v_cents"))
      .withColumn("v_cents",
        when(col("__cx") > 1, raise_error(lit(
          "classicalDecompose: duplicate x within a key — " +
            "pre-aggregate to one row per (key, x)")))
          .otherwise(col("v_cents")))
      .drop("__cx")
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("x").asc)
    val wMa = wOrd.rowsBetween(-h, h)
    val based = cells
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(keyCol))).cast("long"))
      .withColumn("slot", (col("__rn") - 1) % period)
      .withColumn("__tn", sum(col("v_cents")).over(wMa).cast("long"))
      .filter(col("__rn") > h && col("__rn") <= col("__n") - h)
      .withColumn("trend_num", col("__tn"))
      .withColumn("__detr_num",
        col("v_cents") * period - col("trend_num")) // den = period
    val seas = based.groupBy(col(keyCol), col("slot"))
      .agg(sum(col("__detr_num")).cast("long").as("seas_num"),
        (count(lit(1)) * period).cast("long").as("seas_den"))
    based.join(Broadcasts.maybeBroadcast(seas), Seq(keyCol, "slot"))
      .withColumn("resid_den", col("seas_den") * period)
      .withColumn("resid_num",
        col("v_cents") * col("resid_den")
          - col("trend_num") * col("seas_den")
          - col("seas_num") * period)
      .select(col(keyCol), col("x"), col("slot"), col("v_cents"),
        col("trend_num"), col("seas_num"), col("seas_den"),
        col("resid_num"), col("resid_den"))
  }
}
