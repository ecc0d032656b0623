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
}
