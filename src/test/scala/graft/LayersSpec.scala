package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas
import graft.operators.Layers

/** Layer-transform semantics on the FIXTURES.md §2 mock row + the variants
  * it prescribes (NULL money, negative amounts, filtered payment types,
  * duplicate rows, unparsable ids). */
class LayersSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The CI mock row, parameterized. */
  private def trip(vendor: Integer = 1, pickup: String = "2024-01-01 00:00:00",
                   dropoff: String = "2024-01-01 00:10:00", pay: Integer = 1,
                   fare: java.lang.Double = 10.0, tip: java.lang.Double = 2.0,
                   dist: java.lang.Double = 1.5): Row =
    Row(vendor, ts(pickup), ts(dropoff), Integer.valueOf(1), dist,
      Integer.valueOf(1), "N", Integer.valueOf(1), Integer.valueOf(1), pay,
      fare, java.lang.Double.valueOf(0.5), java.lang.Double.valueOf(0.5), tip,
      java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(0.3),
      java.lang.Double.valueOf(13.3), java.lang.Double.valueOf(2.5),
      java.lang.Double.valueOf(1.25))

  private def frame(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.trip)

  test("silver recomputes total_amount from normalized components") {
    val out = Layers.silver(frame(trip(fare = -10.0, tip = null)))
    val r = out.select("fare_amount", "tip_amount", "total_amount").first()
    assert(r.getDouble(0) == 10.0)          // ABS flips the negative
    assert(r.getDouble(1) == 0.0)           // COALESCE nulls to 0
    assert(r.getDouble(2) == 10.0 + 0.5 + 0.5 + 0.0 + 0.0 + 0.3 + 2.5 + 1.25)
  }

  test("silver filters payment_type outside 1..6 (incl. NULL and Flex Fare 0)") {
    val out = Layers.silver(frame(trip(pay = 0), trip(pay = null), trip(pay = 7), trip(pay = 2)))
    assert(out.count() == 1)
    assert(out.select("payment_description").first().getString(0) == "Cash")
  }

  test("silver dedups rows sharing the surrogate key, keeping one deterministic survivor") {
    // same key fields, different fare (non-key column) — DISTINCT ON semantics
    val out = Layers.silver(frame(trip(fare = 10.0), trip(fare = 99.0)))
    assert(out.count() == 1)
    // total ordering extends to remaining columns → smallest fare wins
    assert(out.select("fare_amount").first().getDouble(0) == 10.0)
  }

  test("silver trip_duration_minutes is rounded 2-decimal minutes") {
    val out = Layers.silver(frame(trip(pickup = "2024-01-01 00:00:00", dropoff = "2024-01-01 00:10:20")))
    assert(out.select("trip_duration_minutes").first().getDouble(0) == 10.33)
  }

  test("bronze month filter keeps only the target month") {
    val df = frame(trip(pickup = "2024-01-15 12:00:00"), trip(pickup = "2024-02-01 00:00:00"))
    assert(Layers.bronze(df, Some("2024-01")).count() == 1)
    assert(Layers.bronze(df, None).count() == 2)
  }

  test("stage lowercases columns and coerces garbage ints to NULL") {
    val raw = spark.createDataFrame(
      java.util.List.of(Row("abc", "2"), Row("3", "x")),
      StructType(Seq(StructField("VendorID", StringType), StructField("passenger_count", StringType))))
    val staged = Layers.stage(raw)
    assert(staged.columns.toSeq == Seq("vendorid", "passenger_count"))
    val rows = staged.collect()
    assert(rows(0).isNullAt(0) && rows(0).getInt(1) == 2)
    assert(rows(1).getInt(0) == 3 && rows(1).isNullAt(1))
  }

  test("CSV seed source loads through stage into bronze (S11, reference CI seed)") {
    // mirrors /root/reference/dbt/nyc_taxi/seeds/mock_yellow_tripdata.csv:1-2
    val dir = java.nio.file.Files.createTempDirectory("graft-seed")
    val csv = dir.resolve("mock_yellow_tripdata.csv")
    java.nio.file.Files.write(csv,
      ("vendorid,tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,trip_distance," +
        "ratecodeid,store_and_fwd_flag,pulocationid,dolocationid,payment_type,fare_amount," +
        "extra,mta_tax,tip_amount,tolls_amount,improvement_surcharge,total_amount," +
        "congestion_surcharge,airport_fee\n" +
        "1,2024-01-01 00:00:00,2024-01-01 00:10:00,1,1.5,1,N,1,1,1,10.0,0.5,0.5,2.0,0.0,0.3,13.3,2.5,1.25\n")
        .getBytes)
    val seeded = Layers.stage(
      spark.read.option("header", true)
        .schema(graft.model.Schemas.trip)
        .csv(csv.toString))
    val bronze = Layers.bronze(seeded, Some("2024-01"))
    assert(bronze.schema == graft.model.Schemas.trip)
    val row = bronze.first()
    assert(row.getAs[Int]("vendorid") == 1 && row.getAs[Double]("trip_distance") == 1.5)
    // the seeded row flows through silver end-to-end (CI smoke parity)
    assert(Layers.silver(bronze).count() == 1)
  }

  test("gold daily/monthly/vendor/payment aggregate shapes") {
    val silver = Layers.silver(frame(
      trip(pickup = "2024-01-01 01:00:00", pay = 1),
      trip(pickup = "2024-01-01 02:00:00", dropoff = "2024-01-01 02:30:00", pay = 2),
      trip(pickup = "2024-01-02 01:00:00", pay = 1)))
    val daily = Layers.goldDaily(silver).orderBy("trip_date").collect()
    assert(daily.length == 2 && daily(0).getAs[Long]("total_trips") == 2)
    val monthly = Layers.goldMonthly(silver).collect()
    assert(monthly.length == 1 && monthly(0).getAs[Long]("total_monthly_trips") == 3)
    val vendor = Layers.goldVendor(silver).collect()
    assert(vendor.length == 1 && vendor(0).getAs[String]("vendor_name").startsWith("Creative"))
    val payment = Layers.goldPayment(silver).collect()
    assert(payment.map(_.getAs[String]("payment_description")).toSet == Set("Credit card", "Cash"))
    val pct = payment.map(r => r.getAs[Double]("avg_tip_percent"))
    assert(pct.forall(p => p >= 0 && p <= 100))
  }
}
