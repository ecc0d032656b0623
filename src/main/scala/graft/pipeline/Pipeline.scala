package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.checks.CheckSuite
import graft.incremental.{MetadataLedger, Watermark, Writers}
import graft.operators.Layers

/** The reference DAG re-expressed as one driver program (SURVEY.md §3.1):
  * the 13 Airflow tasks collapse into ordered function calls; XCom becomes
  * a return value; retries become a driver loop; Slack becomes a log line
  * (zero-egress environment). Layout on disk:
  *
  *   lake/staging/   month-partitioned parquet (pickup_month=YYYY-MM)
  *   lake/bronze/    month-partitioned parquet
  *   lake/silver/    keyed delete+insert target
  *   lake/gold_xxx   summary tables
  *   lake/metadata/  single-partition run ledger
  */
class Pipeline(spark: SparkSession, lakeRoot: String, rawSource: String => DataFrame) {

  private val ledger = new MetadataLedger(spark, s"$lakeRoot/metadata")
  private def readOpt(path: String): Option[DataFrame] =
    try { val df = spark.read.parquet(path); df.head(1); Some(df) }
    catch { case _: Throwable => None }

  /** One monthly incremental run end-to-end; returns the loaded month
    * (the reference returns it via XCom, nyc_taxi_pipeline.py:162). */
  def runOnce(pipelineName: String = "yellow_taxi_full_pipeline",
              maxRetries: Int = 3): String = {
    val month = ledger.nextMonth(pipelineName)
    val runId = s"$pipelineName-$month-${System.currentTimeMillis()}"
    val t0 = System.nanoTime()
    ledger.upsertRun(runId, pipelineName, month, "RUNNING")
    var attempt = 0
    while (true) {
      try {
        loadMonth(month)
        ledger.upsertRun(runId, pipelineName, month, "SUCCESS",
          runtimeSeconds = Some((System.nanoTime() - t0) / 1e9))
        return month
      } catch {
        case e: Throwable if attempt < maxRetries => attempt += 1
        case e: Throwable =>
          ledger.upsertRun(runId, pipelineName, month, "FAILED",
            errorMessage = Some(e.toString))
          // Slack alert in the reference (failure_callbacks.py) → log here.
          System.err.println(s"[pipeline] $runId FAILED: ${e.getMessage}")
          throw e
      }
    }
    month
  }

  /** The task chain for one month (create_schemas … finalize). */
  private[graft] def loadMonth(month: String): Unit = {
    // load_yellow_taxi_staging — idempotent month overwrite (S10)
    val staged = Layers.stage(rawSource(month))
    Writers.monthOverwrite(staged, s"$lakeRoot/staging", "tpep_pickup_datetime")

    // dbt_bronze_run + test + GX gate
    val staging = spark.read.parquet(s"$lakeRoot/staging")
      .drop("pickup_month")
    val bronzeDf = Layers.bronze(staging, Some(month))
    Writers.monthOverwrite(bronzeDf, s"$lakeRoot/bronze", "tpep_pickup_datetime")
    val bronzeAll = spark.read.parquet(s"$lakeRoot/bronze").drop("pickup_month")
    CheckSuite.bronzeSuite().gate(bronzeAll)

    // dbt_silver_run (watermark + delete+insert) + gates
    val silverExisting = readOpt(s"$lakeRoot/silver")
    val silverNew = Layers.silver(
      Watermark.strictlyAfterMax(bronzeAll, silverExisting, "tpep_pickup_datetime"))
    val silverMerged = Writers.keyedDeleteInsert(silverExisting, silverNew, Seq("unique_trip_id"))
    Writers.atomicRewrite(silverMerged, s"$lakeRoot/silver")
    val silverAll = spark.read.parquet(s"$lakeRoot/silver")
    CheckSuite.silverSuite(bronzeAll).gate(silverAll)

    // dbt_gold_run — five summaries (monthly/zone use inclusive watermark +
    // keyed upsert; vendor/payment full rebuild, S7)
    val daily = Layers.goldDaily(
      Watermark.strictlyAfterMax(silverAll, readOpt(s"$lakeRoot/gold_daily"),
        "tpep_pickup_datetime", existingTsCol = Some("trip_date")))
    val dailyMerged = Writers.keyedDeleteInsert(readOpt(s"$lakeRoot/gold_daily"), daily, Seq("trip_date"))
    Writers.atomicRewrite(dailyMerged, s"$lakeRoot/gold_daily")

    val monthly = Layers.goldMonthly(
      Watermark.monthFloorInclusive(silverAll, readOpt(s"$lakeRoot/gold_monthly"),
        "revenue_month", "tpep_pickup_datetime"))
    val monthlyMerged = Writers.keyedDeleteInsert(readOpt(s"$lakeRoot/gold_monthly"), monthly, Seq("revenue_month"))
    Writers.atomicRewrite(monthlyMerged, s"$lakeRoot/gold_monthly")

    val zone = Layers.goldZone(
      Watermark.monthFloorInclusive(silverAll, readOpt(s"$lakeRoot/gold_zone"),
        "revenue_month", "tpep_pickup_datetime"))
    val zoneMerged = Writers.keyedDeleteInsert(readOpt(s"$lakeRoot/gold_zone"), zone,
      Seq("revenue_month", "pulocationid"))
    Writers.atomicRewrite(zoneMerged, s"$lakeRoot/gold_zone")

    Writers.fullRebuild(Layers.goldVendor(silverAll), s"$lakeRoot/gold_vendor")
    Writers.fullRebuild(Layers.goldPayment(silverAll), s"$lakeRoot/gold_payment")

    CheckSuite.goldMonthlySuite().gate(spark.read.parquet(s"$lakeRoot/gold_monthly"))
  }
}
