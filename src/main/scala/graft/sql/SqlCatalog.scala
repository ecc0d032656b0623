package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-SQL surface — the interface a dbt user actually has: named
  * tables queried with SQL text. The engine's operators are
  * DataFrame-first (Catalyst gets the whole plan), but the reference's
  * users write `SELECT ... FROM silver_yellow_tripdata`-style SQL
  * (reference: the dbt models directory), so the catalog registers the same names
  * as session views and `spark.sql(...)` replaces `dbt run`'s
  * ref()-resolution. Views are LAZY plans — registering the full
  * medallion lineage costs nothing until a SQL query selects from it,
  * and a query touching only `gold_daily_summary` still gets
  * end-to-end pushdown/pruning through bronze and silver because the
  * whole lineage is one Catalyst plan.
  */
object SqlCatalog {

  /** The driver-provided source tables. */
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every source table under its own name so raw SQL can
    * join them (`spark.sql("SELECT ... FROM lineitem JOIN orders ...")`).
    * Uses [[graft.sources.Tables.read]] — the TIMESTAMP(NANOS)-safe
    * path; a view is a named plan, no data moves. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      graft.sources.Tables.read(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Register the reference's medallion lineage over a raw staging
    * frame (trip schema, [[graft.model.Schemas.trip]]) under the
    * reference's own model names: `staging_yellow_tripdata`,
    * `bronze_yellow_tripdata`, `silver_yellow_tripdata`, and the five
    * `gold_*` marts — the exact names a reference dbt user targets.
    * `targetMonth` scopes bronze the way the reference's incremental
    * run does. */
  def registerLayers(spark: SparkSession, raw: DataFrame,
                     targetMonth: Option[String] = None): Unit = {
    import graft.operators.Layers
    val staging = Layers.stage(raw)
    staging.createOrReplaceTempView("staging_yellow_tripdata")
    val bronze = Layers.bronze(staging, targetMonth)
    bronze.createOrReplaceTempView("bronze_yellow_tripdata")
    val silver = Layers.silver(bronze)
    silver.createOrReplaceTempView("silver_yellow_tripdata")
    Layers.goldDaily(silver).createOrReplaceTempView("gold_daily_summary")
    Layers.goldMonthly(silver).createOrReplaceTempView("gold_monthly_summary")
    Layers.goldZone(silver).createOrReplaceTempView("gold_zone_summary")
    Layers.goldVendor(silver).createOrReplaceTempView("gold_vendor_summary")
    Layers.goldPayment(silver).createOrReplaceTempView("gold_payment_summary")
  }
}
