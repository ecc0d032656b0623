package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Kaplan–Meier life table per key: one row per distinct observed
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
                  eventCol: String): DataFrame = {
    val cells = units
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(keyCol), col(durationCol).as("duration"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
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
}
