package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas of the engine (SURVEY.md §1).
  *
  * The trip schema mirrors the reference staging DDL
  * (reference: dags/nyc_taxi_pipeline.py:72-79) — 19 nullable columns,
  * lowercase names (the reference lowercases on ingest,
  * nyc_taxi_pipeline.py:144). All timestamps are naive/UTC
  * (`spark.sql.session.timeZone=UTC` pinned by the session builders).
  */
object Schemas {

  /** staging.yellow_tripdata_raw — the engine's canonical fact schema. */
  val trip: StructType = StructType(Seq(
    StructField("vendorid", IntegerType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", IntegerType),
    StructField("trip_distance", DoubleType),
    StructField("ratecodeid", IntegerType),
    StructField("store_and_fwd_flag", StringType),
    StructField("pulocationid", IntegerType),
    StructField("dolocationid", IntegerType),
    StructField("payment_type", IntegerType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType),
  ))

  /** The eight money columns normalized by the silver layer
    * (reference: silver_yellow_tripdata.sql:52-59). */
  val moneyColumns: Seq[String] = Seq(
    "fare_amount", "extra", "mta_tax", "tip_amount", "tolls_amount",
    "improvement_surcharge", "congestion_surcharge", "airport_fee")

  /** metadata.pipeline_metadata — run-state control table
    * (reference: dags/nyc_taxi_pipeline.py:88-94). */
  val pipelineMetadata: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("pipeline_name", StringType),
    StructField("run_id", StringType),        // UNIQUE in the reference
    StructField("load_type", StringType),
    StructField("target_month", StringType),  // 'YYYY-MM'
    StructField("last_successful_month", StringType),
    StructField("status", StringType),        // RUNNING | SUCCESS | FAILED
    StructField("runtime_seconds", DoubleType),
    StructField("error_message", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
  ))
}
