package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algebraic partial-aggregate maintenance: compute a daily summary as
  * mergeable partials, so yesterday's materialized aggregate and today's
  * delta combine WITHOUT rescanning history — the incremental-view shape
  * every warehouse needs once the fact table stops fitting a nightly
  * full rebuild. COUNT/SUM/MIN/MAX are the algebraic kernel (AVG derives
  * as sum/count at read time; distinct counts need a sketch — see
  * `Profile.approxNumeric` — or a re-union, and are deliberately not
  * offered here).
  *
  * Exactness contract: the sum partial stays DECIMAL end-to-end
  * (double → decimal(20,6) per element, decimal sums thereafter — pure
  * integer arithmetic), so merge order and partition count cannot change
  * the result, and merged-vs-recomputed is bit-identical — the q133
  * oracle proves merge(prev, delta) ≡ direct full aggregate.
  *
  * At 100 TB: each load aggregates ONLY its delta (one shuffle on the
  * day key, map-side combine); the merge touches |days| rows of stored
  * partials — metadata-scale next to the fact scan it replaces. Compose
  * with `Writers.monthScopedDeleteInsert` to persist only affected days.
  */
object AggMerge {

  /** The stored partial-sum type is PINNED: Spark widens a decimal sum's
    * precision per aggregation (20,6 → 30,6 → capped 38,6), so without the
    * pin a persisted partial table's schema would drift across the first
    * few merge generations, and schema-strict readers of the stored table
    * would break batch-to-batch. 38,6 is the cap Spark converges to
    * anyway; pinning just reaches it on generation one. */
  private val sumType = "decimal(38,6)"

  /** Mergeable daily partials for an event slice: (day, n_events,
    * sum_value_dec (decimal), min_value, max_value). */
  def dailyPartial(events: DataFrame, tsCol: String,
                   valCol: String): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valCol).cast("decimal(20,6)")).cast(sumType).as("sum_value_dec"),
        min(col(valCol)).as("min_value"),
        max(col(valCol)).as("max_value"))

  /** Merge any number of partial frames into one — re-aggregation of
    * partials under the same algebra (sum of counts, sum of decimal
    * sums, min of mins, max of maxes). */
  def merge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "merge needs at least one partial frame")
    parts.reduce(_.unionByName(_))
      .groupBy(col("day"))
      .agg(sum(col("n_events")).cast("long").as("n_events"),
        sum(col("sum_value_dec")).cast(sumType).as("sum_value_dec"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
  }

  /** Read-time finish: the external row shape (decimal partial cast to
    * double exactly once, matching `ScalarFns.exactSum`). */
  def finish(partials: DataFrame): DataFrame =
    partials.select(col("day"), col("n_events"),
      col("sum_value_dec").cast("double").as("sum_value"),
      col("min_value"), col("max_value"))

  /** Mergeable daily DISTINCT-count partials — the piece the algebraic
    * kernel above deliberately excludes (COUNT DISTINCT is not
    * algebraic): Datasketches HLL sketches via Spark's built-in
    * `hll_sketch_agg`. One sketch per day; `lgConfigK` = 12 gives ~1.6%
    * relative standard error at a 4 KB-per-day footprint.
    *
    * Merge contract: HLL union is REGISTER-WISE MAX, so
    * merge(partial(A), partial(B)) is bit-equivalent to partial(A ∪ B)
    * at equal lgConfigK (the spec asserts estimate equality), merging is
    * order-insensitive, and — unlike the SUM/COUNT partials — REPLAYING
    * a merge is idempotent (max is), so a sketch-only sink needs no
    * batch-id fence. At 100 TB each load sketches only its delta; the
    * stored table is |days| × 4 KB. */
  def dailyDistinctPartial(events: DataFrame, tsCol: String,
                           keyCol: String, lgConfigK: Int = 12): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("hll_sketch"))

  /** Union distinct-count partials (register-max; idempotent,
    * order-insensitive). */
  def mergeDistinct(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeDistinct needs at least one partial frame")
    parts.reduce(_.unionByName(_))
      .groupBy(col("day"))
      .agg(hll_union_agg(col("hll_sketch"), lit(false)).as("hll_sketch"))
  }

  /** Read-time finish: (day, n_distinct_approx). */
  def finishDistinct(partials: DataFrame): DataFrame =
    partials.select(col("day"),
      hll_sketch_estimate(col("hll_sketch")).as("n_distinct_approx"))
}
