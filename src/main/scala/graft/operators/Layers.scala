package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ScalarFns._

/** The medallion layer transforms (SURVEY.md §1.3, §2) as pure
  * `DataFrame => DataFrame` functions over the canonical trip schema
  * ([[graft.model.Schemas.trip]]).
  *
  * Each function declares a logical plan only — Catalyst handles column
  * pruning, predicate pushdown into the parquet scan, and partial
  * aggregation; nothing here collects to the driver except scalar
  * watermarks (handled by graft.incremental).
  */
object Layers {

  /** Staging ingest normalization (reference: nyc_taxi_pipeline.py:139-150,
    * S2+S3): lowercase all column names; coerce the six id/int columns with
    * garbage→NULL semantics (`try_cast`, the ANSI-safe analog of pandas
    * `to_numeric(errors='coerce')`). */
  def stage(raw: DataFrame): DataFrame = {
    val lowered = raw.toDF(raw.columns.map(_.toLowerCase): _*)
    val intCols = Seq("vendorid", "passenger_count", "ratecodeid",
      "pulocationid", "dolocationid", "payment_type")
    intCols.foldLeft(lowered) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, col(c).cast("string").try_cast("int"))
      else df
    }
  }

  /** Bronze — explicit 19-column projection, optionally month-filtered
    * (reference: bronze_yellow_tripdata.sql:8-35, P1+P4).
    *
    * At scale the month predicate must prune partitions, not scan+filter:
    * staging is written `partitionBy("pickup_month")` (see
    * graft.incremental.Writers) so this filter hits the partition column. */
  def bronze(staging: DataFrame, targetMonth: Option[String]): DataFrame = {
    val projected = staging.select(graft.model.Schemas.trip.fieldNames.map(col): _*)
    targetMonth match {
      case Some(m) => projected.filter(monthKey(col("tpep_pickup_datetime")) === lit(m))
      case None    => projected
    }
  }

  /** Silver — clean/enrich/dedup (reference: silver_yellow_tripdata.sql):
    *  - high-watermark filter (P5) applied by the caller via
    *    graft.incremental.Watermark (needs the existing target);
    *  - decodes F1-F3, duration F4+F5, ABS/COALESCE money normalization F6,
    *    total recompute F7, md5 surrogate key F8;
    *  - payment_type IN (1..6) filter (P7, silver:63);
    *  - DISTINCT ON (unique_trip_id) dedup (W1, silver:85-87).
    *
    * The md5 key mirrors the reference's 7 fields exactly
    * (silver_yellow_tripdata.sql:72-80): vendorid, pickup, dropoff,
    * pulocationid, dolocationid, passenger_count (default '0'),
    * trip_distance. The only deviation is trip_distance's rendering: the
    * reference CASTs the raw double to VARCHAR, which is not
    * engine-portable ('2' vs '2.0'); we render 2 decimals via
    * [[graft.functions.ScalarFns.render2]]'s integer-cents arithmetic —
    * no grouping separators at any magnitude AND no printf-family
    * rounding divergence at binary-halfway values (SURVEY.md §7.4). */
  def silver(bronzeDf: DataFrame): DataFrame = {
    val moneyFixed = graft.model.Schemas.moneyColumns.foldLeft(bronzeDf) {
      (df, c) => df.withColumn(c, absCoalesce0(col(c)))
    }
    val enriched = moneyFixed
      .withColumn("vendor_name", decodeVendor(col("vendorid")))
      .withColumn("rate_description", decodeRatecode(col("ratecodeid")))
      .withColumn("payment_description", decodePayment(col("payment_type")))
      .withColumn("trip_duration_minutes",
        durationMinutes(col("tpep_pickup_datetime"), col("tpep_dropoff_datetime")))
      .filter(col("payment_type").isin(1, 2, 3, 4, 5, 6))
      // F7 — total_amount recomputed additively from normalized components
      .withColumn("total_amount",
        col("fare_amount") + col("extra") + col("mta_tax") + col("tip_amount") +
          col("tolls_amount") + col("improvement_surcharge") +
          col("congestion_surcharge") + col("airport_fee"))
      .withColumn("unique_trip_id", surrogateKey(Seq(
        col("vendorid")            -> "-1",
        col("tpep_pickup_datetime")-> "1900-01-01",
        col("tpep_dropoff_datetime")-> "1900-01-01",
        col("pulocationid")        -> "-1",
        col("dolocationid")        -> "-1",
        col("passenger_count")     -> "0",
        render2(col("trip_distance")) -> "0",
      )))
    Dedup.firstRowPerKeyTotal(enriched,
      keys = Seq("unique_trip_id"), ordering = Seq("tpep_pickup_datetime"))
  }

  /** Gold daily summary (reference: gold_daily_summary.sql:6-21, A1). */
  def goldDaily(silverDf: DataFrame): DataFrame =
    silverDf.groupBy(to_date(col("tpep_pickup_datetime")).as("trip_date"))
      .agg(
        count(lit(1)).as("total_trips"),
        sum(col("passenger_count")).as("total_passengers"),
        exactSum(col("trip_distance")).as("total_distance_miles"),
        exactSum(col("total_amount")).as("total_revenue"),
        exactSum(col("tip_amount")).as("total_tips"),
        exactAvg(col("fare_amount")).as("avg_fare"),
        exactAvg(col("trip_distance")).as("avg_trip_distance"))

  /** Gold monthly summary (reference: gold_monthly_summary.sql:10-24, A2). */
  def goldMonthly(silverDf: DataFrame): DataFrame =
    silverDf.groupBy(date_trunc("month", col("tpep_pickup_datetime")).as("revenue_month"))
      .agg(
        exactSum(col("total_amount")).as("total_monthly_revenue"),
        sum(col("passenger_count")).as("total_monthly_passengers"),
        count(lit(1)).as("total_monthly_trips"),
        exactAvg(col("trip_distance")).as("avg_trip_distance"))

  /** Gold zone summary (reference: gold_zone_summary.sql:10-23, A3). */
  def goldZone(silverDf: DataFrame): DataFrame =
    silverDf.groupBy(
        date_trunc("month", col("tpep_pickup_datetime")).as("revenue_month"),
        col("pulocationid"))
      .agg(
        exactSum(col("total_amount")).as("total_revenue"),
        count(lit(1)).as("total_trips"))

  /** Gold vendor summary (reference: gold_vendor_summary.sql:3-11, A4). */
  def goldVendor(silverDf: DataFrame): DataFrame =
    silverDf.groupBy(col("vendor_name"))
      .agg(
        count(lit(1)).as("total_trips"),
        exactSum(col("total_amount")).as("total_revenue"),
        exactSum(col("trip_distance")).as("total_distance"),
        exactAvg(col("trip_distance")).as("avg_trip_distance"),
        exactAvg(col("fare_amount")).as("avg_fare"))

  /** Gold payment summary (reference: gold_payment_summary.sql:3-13, A5).
    * `avg_tip_percent` is a post-aggregation ratio of two SUMs (NOT an
    * average of per-row percentages, despite the reference's column name). */
  def goldPayment(silverDf: DataFrame): DataFrame =
    silverDf.groupBy(coalesce(col("payment_description"), lit("Unknown")).as("payment_description"))
      .agg(
        count(lit(1)).as("trip_count"),
        exactSum(col("total_amount")).as("total_revenue"),
        exactSum(col("tip_amount")).as("total_tips"))
      .withColumn("avg_tip_percent",
        round(guardedPercent(col("total_tips"), col("total_revenue")), 2))
}
