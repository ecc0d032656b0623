package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event stream: group users by the
  * ISO week of their FIRST event (the cohort), then count how many of
  * each cohort are still active k weeks later — the standard retention
  * triangle every product/engagement pipeline derives.
  */
object Retention {

  /** (cohort_week, week_index) → distinct active users. Two shuffles,
    * both on keys with map-side reduction: the first-event aggregate
    * (per user), and the final (cohort, week) distinct-count; the join
    * back to events is a key equi-join on the user. week_index =
    * floor(days-since-first / 7) in exact integer-day space — no
    * timestamp arithmetic ambiguity; cohort_week truncates to the ISO
    * Monday (identical in Spark and the oracle engines). */
  def cohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__first_ts"))
    events
      .join(first, col(userCol) === col("__u"))
      .select(col(userCol).as("user_id"),
        date_trunc("week", col("__first_ts")).cast("date").as("cohort_week"),
        floor(datediff(to_date(col(tsCol)), to_date(col("__first_ts"))) / 7.0)
          .cast("int").as("week_index"))
      .groupBy(col("cohort_week"), col("week_index"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Cohort revenue / LTV curve — [[cohorts]] with money attached: per
    * (cohort_week, week_index), active users, exact weekly revenue, the
    * cohort's RUNNING cumulative revenue, and cumulative revenue per
    * cohort member (the LTV-by-age curve marketing plots). Revenue
    * stays decimal through the running window (order-free, engine-
    * exact); each LTV is one double division by the cohort size (ALL
    * first-week members, not week-i actives — LTV denominators don't
    * shrink as users churn).
    *
    * Shape: [[cohorts]]' two keyed aggregates, plus one running window
    * over the (cohort, week) table and a broadcast cohort-size join —
    * both metadata-scale. */
  def cohortRevenue(events: DataFrame, userCol: String, tsCol: String,
                    valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = events.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__first_ts"))
    val tagged = events
      .join(first, col(userCol) === col("__u"))
      .select(col(userCol).as("user_id"),
        date_trunc("week", col("__first_ts")).cast("date").as("cohort_week"),
        floor(datediff(to_date(col(tsCol)), to_date(col("__first_ts"))) / 7.0)
          .cast("int").as("week_index"),
        col(valCol).as("__v"))
    val sizes = first
      .select(date_trunc("week", col("__first_ts")).cast("date")
        .as("cohort_week"), col("__u"))
      .groupBy(col("cohort_week"))
      .agg(countDistinct(col("__u")).as("cohort_size"))
    val weekly = tagged.groupBy(col("cohort_week"), col("week_index"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(col("__v").cast("decimal(20,6)")).cast("decimal(38,6)").as("__rev"))
    val w = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_index").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("__cum", sum(col("__rev")).over(w).cast("decimal(38,6)"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_index"), col("n_active"),
        col("cohort_size"),
        col("__rev").cast("double").as("revenue"),
        col("__cum").cast("double").as("cum_revenue"),
        (col("__cum").cast("double") / col("cohort_size").cast("double"))
          .as("ltv_per_user"))
  }

  /** Rolling distinct active users: for every calendar day, the count of
    * distinct keys active in the trailing `windowDays` window (WAU=7,
    * MAU=30). Sliding DISTINCT cannot run as a window aggregate (no
    * engine supports COUNT(DISTINCT) OVER); the scale shape is
    * contribute-then-count: dedup to (key, active day), explode each
    * into the `windowDays` report days it contributes to (bounded ×W
    * map-side fan-out of an already-day-deduped frame — not of raw
    * events), then one distinct-count per report day. Report days are
    * clamped to the observed [min, max] day span.
    */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val perDay = events
      .select(col(userCol).as("user_id"), col(tsCol).cast("date").as("day"))
      .distinct()
    val bounds = perDay.agg(min(col("day")).as("min_day"),
      max(col("day")).as("max_day"))
    perDay
      .join(Broadcasts.maybeBroadcast(bounds))
      .select(col("user_id"), explode(sequence(
        greatest(col("day"), col("min_day")),
        least(date_add(col("day"), windowDays - 1), col("max_day"))))
        .as("report_day"))
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Engagement stickiness: per day, DAU / trailing-`windowDays`-AU
    * (the classic DAU/WAU ratio — "what share of this week's users
    * showed up today"). Composes two [[rollingActive]] passes (window 1
    * and `windowDays`) over the SAME day-deduped stream; the ratio is
    * two BIGINTs divided once in double space — engine-exact. Early
    * days (within windowDays of the stream start) use the truncated
    * window, the standard convention. */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
                 windowDays: Int = 7): DataFrame = {
    val dau = rollingActive(events, userCol, tsCol, 1)
      .withColumnRenamed("n_active", "dau")
    val wau = rollingActive(events, userCol, tsCol, windowDays)
      .withColumnRenamed("n_active", "wau")
    dau.join(wau, Seq("report_day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
  }

  /** RFM segmentation — the classic customer scoring: per user,
    * Recency (latest event instant), Frequency (event count) and
    * Monetary (decimal-exact value sum), each cut into `nBuckets`
    * exact global NTILE buckets with bucket 1 = best (most recent /
    * most frequent / highest spend), plus the concatenated `rfm_segment`
    * code ("111" = champions, "555" = lost at nBuckets=5).
    *
    * Exactness: recency ranks on integer microseconds, frequency on
    * BIGINTs, monetary on the decimal-path sum — and each cut goes
    * through [[graft.llmdata.Sampling.globalNtile]] (ties broken by
    * user id), so no corpus-wide single-partition window exists and
    * the result is bit-identical to the plain one-window NTILE the
    * oracle runs.
    *
    * Shape at 100 TB: one user-keyed aggregate, then three
    * globalNtile passes over the USER-level frame (users ≪ events),
    * joined back on the user key.
    *
    * Division of labor vs [[graft.operators.Profile.rfmScores]]:
    * this one is NTILE semantics (equal-size bins, ties may straddle
    * an edge); that one scores by value thresholds (tied values always
    * agree, bins uneven). */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
          valueCol: String, nBuckets: Int = 5): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(max(unix_micros(col(tsCol).cast("timestamp"))).as("last_us"),
        count(lit(1)).as("frequency"),
        graft.functions.ScalarFns.exactSum(col(valueCol)).as("monetary"))
    def cut(scoreCol: String, as: String): DataFrame =
      graft.llmdata.Sampling.globalNtile(
        perUser.select(col(userCol), col(scoreCol)),
        userCol, scoreCol, nBuckets)
        .select(col(userCol), col("bucket").cast("int").as(as))
    perUser
      .join(cut("last_us", "r"), Seq(userCol))
      .join(cut("frequency", "f"), Seq(userCol))
      .join(cut("monetary", "m"), Seq(userCol))
      .withColumn("rfm_segment",
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")))
      .select(col(userCol), col("last_us"), col("frequency"),
        col("monetary"), col("r"), col("f"), col("m"), col("rfm_segment"))
  }

  /** Daily growth accounting — the canonical DAU decomposition every
    * growth team reads: each day's actives split into `new` (first day
    * ever), `retained` (also active the previous day), `resurrected`
    * (seen before, but not yesterday); plus `churned` = users active
    * the previous day who did not return today. The identity
    * `dau(d) = new + retained + resurrected` holds by construction,
    * and `dau(d) = dau(d-1) + new + resurrected - churned` follows.
    *
    * Shape: one distinct to (user, day), one user-partitioned window
    * for lag/lead over each user's ACTIVE days (per-user state is the
    * user's active-day count, not raw events), one day-keyed aggregate
    * + a full-outer align of the churn series (churn attributes to the
    * day AFTER the last active day). All integer counts. */
  def growthAccounting(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val perDay = events
      .select(col(userCol).as("user_id"), col(tsCol).cast("date").as("day"))
      .distinct()
      .withColumn("__prev", lag(col("day"), 1).over(w))
      .withColumn("__next", lead(col("day"), 1).over(w))
    val classes = perDay
      .withColumn("is_new", col("__prev").isNull)
      .withColumn("is_retained",
        col("__prev").isNotNull && col("__prev") === date_sub(col("day"), 1))
      .withColumn("is_resurrected",
        col("__prev").isNotNull && col("__prev") < date_sub(col("day"), 1))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(col("is_new").cast("long")).as("n_new"),
        sum(col("is_retained").cast("long")).as("n_retained"),
        sum(col("is_resurrected").cast("long")).as("n_resurrected"))
    // a user churns on day+1 when their next active day is not day+1
    val churn = perDay
      .filter(col("__next").isNull || col("__next") =!= date_add(col("day"), 1))
      .groupBy(date_add(col("day"), 1).as("day"))
      .agg(count(lit(1)).as("n_churned"))
    classes.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Kaplan-Meier survival curve over user lifetimes — the
    * right-censoring-aware answer to "what share of users are still
    * active after t days", where naive retention curves silently count
    * still-alive users as churned. Lifetime = days from a user's first
    * to last event; a user whose last event falls within `censorDays`
    * of the stream end is CENSORED (we only know they survived at least
    * that long), not dead.
    *
    * Estimator: at each observed lifetime t, with n_t users still at
    * risk and d_t (uncensored) deaths, `S(t) = Π_{j ≤ t} (1 − d_j/n_j)`.
    * Censored users count in n at their censor time and drop out after
    * (the standard deaths-before-censoring convention).
    *
    * Engine determinism: n/d/c are exact BIGINTs; each factor is ONE
    * IEEE division; and the running product is an ORDERED left fold
    * (ascending t) via `aggregate` over a running `collect_list` — both
    * engines multiply the same doubles in the same order, so the curve
    * hashes bit-exact (an unordered product aggregate would not).
    *
    * Shape at 100 TB: one per-user aggregate (map-side combine), a
    * one-row stream-end frame broadcast back, then EVERYTHING else runs
    * on the lifetime-day table — |distinct lifetimes| ≤ span days, the
    * documented metadata-scale escape for its unpartitioned windows
    * (the prefix collect_list carries O(days) state on a O(days) frame).
    *
    * Output: (t_day, n_at_risk, n_deaths, n_censored, survival). */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  censorDays: Int): DataFrame =
    kaplanMeierBy(events.withColumn("__seg", lit("all")), "__seg",
      userCol, tsCol, censorDays).drop("__seg")

  /** [[kaplanMeier]] stratified by a segment column (acquisition
    * channel, plan tier, cohort) — the form survival analysis actually
    * ships as: one curve PER SEGMENT so channels can be compared.
    * (Division of labor: this is the event-stream convenience with the
    * finished survival curve; `Survival.kaplanMeier` is the
    * units-frame LIFE-TABLE core — exact integers only, hash-exact for
    * the oracle gate — and `Survival.logRankParts` its two-arm test.)
    * Same estimator, same ordered-fold determinism; the day-table
    * windows partition by the segment, the censoring horizon stays the
    * GLOBAL stream end (segments share one wall clock — a per-segment
    * end would censor a dying segment's users against their own
    * silence). */
  def kaplanMeierBy(events: DataFrame, segmentCol: String, userCol: String,
                    tsCol: String, censorDays: Int): DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    import org.apache.spark.sql.expressions.Window
    val perUser = events
      .groupBy(col(segmentCol), col(userCol).as("__u"))
      .agg(min(col(tsCol).cast("date")).as("__fd"),
        max(col(tsCol).cast("date")).as("__ld"))
    val end = perUser.agg(max(col("__ld")).as("__stream_end"))
    val labeled = perUser.join(Broadcasts.maybeBroadcast(end))
      .select(col(segmentCol),
        datediff(col("__ld"), col("__fd")).as("t_day"),
        // inclusive: censorDays = 0 still censors users whose last event
        // IS the stream-end day (indistinguishable from still-active)
        (col("__ld") >= date_sub(col("__stream_end"), censorDays))
          .as("__censored"))
    val byT = labeled.groupBy(col(segmentCol), col("t_day"))
      .agg(sum(when(col("__censored"), lit(0L)).otherwise(lit(1L)))
        .cast("long").as("n_deaths"),
        sum(when(col("__censored"), lit(1L)).otherwise(lit(0L)))
          .cast("long").as("n_censored"))
    val totals = byT.groupBy(col(segmentCol))
      .agg(sum(col("n_deaths") + col("n_censored")).cast("long")
        .as("__total"))
    val wPrior = Window.partitionBy(col(segmentCol))
      .orderBy(col("t_day").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(segmentCol))
      .orderBy(col("t_day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.join(Broadcasts.maybeBroadcast(totals), Seq(segmentCol))
      .withColumn("n_at_risk",
        col("__total") - coalesce(
          sum(col("n_deaths") + col("n_censored")).over(wPrior), lit(0L)))
      .withColumn("__factor",
        lit(1.0) - col("n_deaths").cast("double")
          / col("n_at_risk").cast("double"))
      .withColumn("survival",
        aggregate(collect_list(col("__factor")).over(wRun), lit(1.0),
          (acc, x) => acc * x))
      .select(col(segmentCol), col("t_day"), col("n_at_risk"),
        col("n_deaths"), col("n_censored"), col("survival"))
  }

  /** Activity streaks (gaps-and-islands) per user: consecutive-day
    * runs over the DISTINCT active-day frame — the classic islands
    * identity `island = day_number − row_number` (consecutive days
    * share it; both sides integer, no date arithmetic edge). One
    * summary row per user: active-day count, number of streaks,
    * longest streak, and the streak ending at the user's LAST
    * active day (`last_streak` — the "current streak as of the data's
    * end" readout).
    *
    * Windows run per-user over distinct DAYS (values-scale after the
    * first aggregate — the RankStats discipline); all outputs exact
    * BIGINTs. */
  def streaks(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = events.filter(col(tsCol).isNotNull)
      .select(col(userCol), to_date(col(tsCol)).as("__day")).distinct()
      .withColumn("__dn", datediff(col("__day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("__dn").asc)
    val islands = days
      .withColumn("__island", col("__dn") - row_number().over(w))
      .groupBy(col(userCol), col("__island"))
      .agg(count(lit(1)).as("__len"), max(col("__dn")).as("__end"))
    islands.groupBy(col(userCol))
      .agg(sum(col("__len")).cast("long").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).cast("long").as("longest_streak"),
        max(struct(col("__end").as("e"), col("__len").as("l"))).getField("l")
          .cast("long").as("last_streak"))
  }


  /** Churn-label training-set builder — the standard
    * observation/outcome-window construction for churn models, made
    * deterministic: features come ONLY from events in
    * `[obsStart, obsEnd)` (count, active days, span, value sum in
    * cents), the label is "no activity in `[obsEnd, obsEnd+horizon)"
    * — users with no observation-window activity are excluded (no
    * features to learn from), so the frame is leakage-free by
    * construction: nothing after `obsEnd` touches a feature column.
    *
    * One pass over the event stream (two conditional aggregates per
    * user); all features exact BIGINTs (cent-unit value sums — 2-dp
    * grid contract). Output: (user, n_events_obs, n_active_days_obs,
    * span_days_obs, value_cents_obs, churned). */
  def churnLabels(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, obsStart: String, obsEnd: String,
                  horizonDays: Int): DataFrame = {
    require(horizonDays >= 1, s"horizonDays must be >= 1, got $horizonDays")
    val obsS = lit(obsStart).cast("timestamp_ntz")
    val obsE = lit(obsEnd).cast("timestamp_ntz")
    // derive the outcome end from obsE ITSELF (not a date-truncated
    // copy): if obsEnd carries a time-of-day, date_add at midnight
    // would shorten the outcome window below horizonDays and skew the
    // churn labels; obsE + exact day-time interval keeps the window
    // width exactly horizonDays regardless of obsEnd's clock time
    val outE = obsE + make_dt_interval(lit(horizonDays))
    val inObs = col(tsCol) >= obsS && col(tsCol) < obsE
    val inOut = col(tsCol) >= obsE && col(tsCol) < outE
    events.filter(col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(
        sum(when(inObs, 1L).otherwise(0L)).as("n_events_obs"),
        count_distinct(when(inObs, to_date(col(tsCol))))
          .cast("long").as("n_active_days_obs"),
        (datediff(max(when(inObs, to_date(col(tsCol)))),
          min(when(inObs, to_date(col(tsCol))))))
          .cast("long").as("span_days_obs"),
        sum(when(inObs,
          (col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .otherwise(0L)).cast("long").as("value_cents_obs"),
        (sum(when(inOut, 1L).otherwise(0L)) === 0L).as("churned"))
      .filter(col("n_events_obs") > 0L)
  }

}
