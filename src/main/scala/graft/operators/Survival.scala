package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Survival analysis — time-to-event tables for churn/retention work
  * (how long does a user/subscription/device stay active, with the
  * still-active population handled honestly instead of dropped):
  * the Kaplan–Meier life table, in the engine's exact-integer
  * discipline.
  *
  * Follows the [[RankStats]] rules: one hash aggregate over the unit
  * frame (units are already per-key aggregates of the raw stream —
  * this operator never sees raw events), windows only over the per-key
  * DISTINCT-DURATION lattice, every compared column a BIGINT count or
  * a single-division double.
  */
object Survival {

  /** Kaplan–Meier LIFE TABLE per key: one row per distinct observed
    * duration with exact at-risk/event/censor INTEGERS and the per-row
    * hazard — the ORACLE-COMPARABLE core. Division of labor with
    * [[Retention.kaplanMeierBy]] (which stays the event-stream
    * convenience wrapper): Retention derives durations + censoring
    * from a raw event stream and finishes the SURVIVAL PRODUCT via its
    * documented ordered fold; this operator takes an already-built
    * UNITS frame (any duration/censor definition — subscriptions,
    * device uptimes, ticket ages) and deliberately stops at the exact
    * integers, because the float product has no engine-portable form
    * (see below). Use Retention for the one-call curve over events;
    * use this + [[logRankParts]] when the gate needs hash-exact rows
    * or a two-arm comparison.
    *
    * One row per distinct observed
    * duration `t` with the at-risk count `n_risk` (units whose
    * duration ≥ t), event count `n_events` (units with an EVENT at t),
    * censored count `n_censored` (units still alive when observation
    * ended at t), and the discrete hazard `h(t) = n_events/n_risk` —
    * one exact division per row.
    *
    * The survival curve `S(t) = Π_{u ≤ t} (1 − h(u))` is deliberately
    * NOT emitted: a cumulative float PRODUCT has no engine-portable
    * exact form (log/exp is libm; windowed products associate
    * differently across engines) — derive it caller-side over the
    * values-scale table, where the sequential product is a fixed
    * chain. The exact integer columns are the oracle-comparable core.
    *
    * `eventCol`: boolean — true = the terminal event was OBSERVED
    * (churned), false = right-censored (observation window ended).
    * NULL duration/event rows are excluded. Durations may be any
    * orderable numeric (days, seconds); at-risk counts come from a
    * DESC-cumulation identity (`n_risk = n_total − count(duration <
    * t)`) so the only window is the per-key distinct-duration
    * cumulative — values-scale, never unit-scale. */
  def kaplanMeier(units: DataFrame, keyCol: String, durationCol: String,
                  eventCol: String): DataFrame =
    kaplanMeierFromCells(
      survivalCells(units, keyCol, durationCol, eventCol), keyCol)

  /** The (key, duration) → (n_events, n_censored) cell PARTIAL of
    * [[kaplanMeier]] — a mergeable COUNT algebra (cells from disjoint
    * unit slices merge by summing counts per cell), which is what lets
    * [[graft.streaming.Streaming.survivalMonitorSink]] maintain live
    * churn curves: per-batch cost is one delta-sized aggregate + a
    * cells-scale merge, never a unit-table rescan. */
  def survivalCells(units: DataFrame, keyCol: String, durationCol: String,
                    eventCol: String): DataFrame =
    units
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(keyCol), col(durationCol).as("duration"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))

  /** Finish a [[survivalCells]] frame to the KM life table (the second
    * half of [[kaplanMeier]] — see its scaladoc for the at-risk
    * identity and exactness contract). `cells` must carry
    * (`keyCol`, duration, n_events, n_censored). */
  def kaplanMeierFromCells(cells: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("duration").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = cells.groupBy(col(keyCol))
      .agg(sum(col("n_events") + col("n_censored")).as("__n_total"))
    cells
      .withColumn("__cum",
        sum(col("n_events") + col("n_censored")).over(w))
      .join(Broadcasts.maybeBroadcast(totals), Seq(keyCol))
      // at risk at t = everyone minus those who exited strictly before
      .withColumn("n_risk",
        col("__n_total") - (col("__cum") - col("n_events") - col("n_censored")))
      .withColumn("hazard",
        col("n_events").cast("double") / col("n_risk").cast("double"))
      .select(col(keyCol), col("duration"), col("n_risk"), col("n_events"),
        col("n_censored"), col("hazard"))
  }

  /** Log-rank test PARTS — "do two survival curves differ?", the
    * churn A/B test over [[kaplanMeier]]: at each distinct EVENT time,
    * the at-risk and event counts per arm plus the exact integer parts
    * of arm-A's expected events under the null
    * (`E_A(t) = d_t·n_At/n_t` — emitted as `e_num = d_t·n_At` over
    * `e_den = n_t`, with `expected_a` the one division). Per the SRM
    * order-free convention the per-TIME rows are the output — the
    * statistic `(Σd_A − ΣE_A)²/ΣV` sums a values-scale handful of
    * times, which a float Σ inside the engine would make
    * partition-order-dependent; the caller (or a driver-side line)
    * folds them in time order. Same DESC-cumulation at-risk identity
    * as [[kaplanMeier]]; times with no events in either arm are
    * dropped (they contribute nothing).
    *
    * The hypergeometric VARIANCE parts complete the statistic:
    * `V_t = d_t(n_t−d_t)·n_At·n_Bt / (n_t²(n_t−1))` — emitted as
    * `v_num`/`v_den` exact BIGINTs (decimal internally; v_den = n³
    * scale, loud ANSI overflow past ~2e6 at-risk — realistic cohort
    * tables sit far below) with `variance` the one division, NULL at
    * n_t = 1. The caller folds `(Σd_A − Σexpected_A)²/Σvariance` over
    * the values-scale times for the χ²₁ statistic.
    *
    * Output per event time: (duration, n_risk_a, n_risk_b, d_a, d_b,
    * e_num, e_den, expected_a, v_num, v_den, variance). */
  def logRankParts(units: DataFrame, isGroupA: Column, durationCol: String,
                   eventCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = units.filter(col(durationCol).isNotNull
      && col(eventCol).isNotNull && isGroupA.isNotNull)
      .select(isGroupA.as("__a"), col(durationCol).as("duration"),
        col(eventCol).as("__e"))
    val cells = base.groupBy(col("duration"))
      .agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("__xa"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__xb"),
        sum(when(col("__a") && col("__e"), 1L).otherwise(0L)).as("d_a"),
        sum(when(!col("__a") && col("__e"), 1L).otherwise(0L)).as("d_b"))
    val w = Window.orderBy(col("duration").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // __nlat rides the totals aggregate (no extra pass) and guards
    // the values-scale claim the global window depends on: a
    // CONTINUOUS duration column (lattice ≈ units) refuses loudly
    // instead of collapsing the whole frame onto one task. The guard
    // replaces __xa BELOW the window, so it evaluates per row on the
    // distributed side of the single-partition exchange — the raise
    // fires BEFORE any one-task sort ever materializes
    // (PlanAudit.latticeGuard — round-14, VERDICT r13 #3)
    val totals = cells.agg(sum(col("__xa")).as("__na"),
      sum(col("__xb")).as("__nb"), count(lit(1)).as("__nlat"))
    cells
      .crossJoin(broadcast(totals))
      .withColumn("__xa", PlanAudit.latticeGuard(col("__xa"),
        col("__nlat"), "logRankParts"))
      .withColumn("__cuma", sum(col("__xa")).over(w))
      .withColumn("__cumb", sum(col("__xb")).over(w))
      .withColumn("n_risk_a",
        (col("__na") - (col("__cuma") - col("__xa"))).cast("long"))
      .withColumn("n_risk_b",
        (col("__nb") - (col("__cumb") - col("__xb"))).cast("long"))
      .filter(col("d_a") + col("d_b") > 0)
      .withColumn("e_num",
        ((col("d_a") + col("d_b")).cast(d38) * col("n_risk_a"))
          .cast(d38).cast("long"))
      .withColumn("e_den", (col("n_risk_a") + col("n_risk_b")).cast("long"))
      .withColumn("expected_a",
        col("e_num").cast("double") / col("e_den").cast("double"))
      .withColumn("__d", col("d_a") + col("d_b"))
      .withColumn("v_num",
        (col("__d").cast(d38) * (col("e_den") - col("__d"))
          * col("n_risk_a") * col("n_risk_b")).cast(d38).cast("long"))
      .withColumn("v_den",
        (col("e_den").cast(d38) * col("e_den") * (col("e_den") - 1))
          .cast(d38).cast("long"))
      .withColumn("variance",
        when(col("v_den") > 0,
          col("v_num").cast("double") / col("v_den").cast("double")))
      .select(col("duration"), col("n_risk_a"), col("n_risk_b"),
        col("d_a"), col("d_b"), col("e_num"), col("e_den"),
        col("expected_a"), col("v_num"), col("v_den"), col("variance"))
  }
}
