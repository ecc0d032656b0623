package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust-statistics cleanup operators: outlier clamping for numeric
  * feature columns (fare amounts, document lengths, embedding norms) —
  * the standard pre-aggregation step that keeps a handful of corrupt
  * rows from dominating sums and means.
  */
object Robust {

  /** Winsorize: clamp `valueCol` to its exact [`loP`, `hiP`] percentile
    * interval (linear-interpolated, the SQL `percentile`/`quantile_cont`
    * definition — exact and engine-portable, proven by the q56 parity
    * family). Adds `<valueCol>_winsorized`; NULLs pass through
    * unclamped (percentile ignores them, and clamping NULL is NULL).
    *
    * Scale note: Spark's exact `percentile` aggregates a value→count
    * map, so memory tracks the DISTINCT value count — fine for
    * prices/counts/scores (bounded grids), the wrong tool for
    * high-cardinality continuous columns at 100 TB, where callers
    * should pass the same frame through `approx_percentile` instead
    * (same clamp shape, sketch-bounded memory, no oracle exactness).
    * The two-row bounds frame rides as a broadcast — no second shuffle
    * of the data. */
  def winsorize(df: DataFrame, valueCol: String,
                loP: Double, hiP: Double): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP <= hiP, s"bad percentiles [$loP, $hiP]")
    val bounds = df.agg(
      percentile(col(valueCol), lit(loP)).as("__lo"),
      percentile(col(valueCol), lit(hiP)).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
