package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Timeseries

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 9) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("gapFillDaily restores missing calendar days and forward-fills") {
    val events = Seq(
      ("a", ts(1), 1.0), ("a", ts(1, 15), 2.0), // day 1: 3.0
      ("a", ts(4), 7.5),                        // days 2-3 missing
      ("b", ts(2), 5.0)                         // single-day key
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillDaily(events, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out.size == 5, "a: 4 spine days, b: 1")
    assert(out(("a", "2024-01-01")) == ((true, Some(3.0))))
    assert(out(("a", "2024-01-02")) == ((false, Some(3.0))), "gap day carries day-1 value")
    assert(out(("a", "2024-01-03")) == ((false, Some(3.0))))
    assert(out(("a", "2024-01-04")) == ((true, Some(7.5))))
    assert(out(("b", "2024-01-02")) == ((true, Some(5.0))))
  }

  test("rollingDaily uses a calendar RANGE frame, not a row frame") {
    // days 1, 2, 9: a 7-day window at day 9 must see ONLY day 9 (days 1-2
    // are 8 and 7 days back) — a ROWS frame would wrongly include them
    val events = Seq(
      ("a", ts(1), 10.0), ("a", ts(2), 20.0), ("a", ts(9), 40.0)
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.rollingDaily(events, "user_id", "ts", "value", windowDays = 7)
      .collect()
      .map(r => r.getDate(1).toString -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out("2024-01-01") == ((1L, 10.0)))
    assert(out("2024-01-02") == ((2L, 30.0)))
    assert(out("2024-01-09") == ((1L, 40.0)), "days 1-2 fell out of the 7-day frame")
  }

  test("anomalousDays flags the spike day and nothing on a uniform key") {
    // key "spiky": 9 days of 1 event + 1 day of 30 events; key "flat":
    // identical counts every day → variance 0, never flagged
    val rows =
      (1 to 9).map(d => ("spiky", ts(d))) ++
        (1 to 30).map(_ => ("spiky", ts(10))) ++
        (1 to 12).flatMap(d => Seq(("flat", ts(d)), ("flat", ts(d, 16))))
    val events = rows.toDF("event_type", "ts").withColumn("value", lit(1.0))
    val out = Timeseries.anomalousDays(events, "event_type", "ts", k = 2)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(out.toSeq == Seq(("spiky", "2024-01-10", 30L)))
  }

  test("trendByKey recovers an exact linear series and filters degenerates") {
    // key "up": y = 2x + 3 on days 1..5 → slope exactly 2, intercept 3
    val rows = (0 until 5).flatMap { x =>
      (1 to (2 * x + 3)).map(_ => ("up", ts(x + 1)))
    } ++ Seq(("one_day", ts(1)), ("one_day", ts(1, 10)))
    val out = graft.operators.Timeseries
      .trendByKey(rows.toDF("event_type", "ts"), "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("up") == ((5L, 2.0, 3.0)), "exact fit has zero residual")
    assert(!out.contains("one_day"), "single-day keys have no defined slope")
  }

  test("anomalousDays matches the float z-score rule on a mixed series") {
    // independent float reference: flag iff |x - mean| > k * stddev_pop
    val counts = Seq(3, 4, 5, 3, 4, 25, 4, 3, 5, 4)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map(_ => ("t", ts(i + 1)))
    }
    val events = rows.toDF("event_type", "ts")
    val mean = counts.sum.toDouble / counts.size
    val varp = counts.map(c => (c - mean) * (c - mean)).sum / counts.size
    val expected = counts.zipWithIndex.collect {
      case (c, i) if math.abs(c - mean) > 2 * math.sqrt(varp) =>
        f"2024-01-${i + 1}%02d"
    }.toSet
    val got = Timeseries.anomalousDays(events, "event_type", "ts", k = 2)
      .collect().map(_.getDate(1).toString).toSet
    assert(got == expected && expected == Set("2024-01-06"))
  }

  test("periodOverPeriod aligns by calendar day, not row position") {
    val ev = Seq(
      (ts(1), 10.0), (ts(2), 20.0),
      (ts(9), 25.0) // 7 days after day 2; day 8 (after day 1) is absent
    ).toDF("ts", "value")
    val out = Timeseries.periodOverPeriod(ev, "ts", "value", lagDays = 7)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((Option(r.getAs[java.lang.Double]("prior_sum_value")),
          Option(r.getAs[java.lang.Double]("pct_change"))))).toMap
    assert(out("2024-01-01") == ((None, None)), "no prior period")
    assert(out("2024-01-09") == ((Some(20.0), Some(0.25))),
      "day 9 compares against day 2 — a row-lag would have grabbed day 1")
  }

  test("levelShift finds the boundary that maximizes the mean jump") {
    // key a: 1,1,1 then 9,9 — boundary after day 3; key b: 2 days flat
    // (zero shift, boundary after day 1 by tie rule); key c: 1 day only
    val ev = Seq(
      ("a", ts(1), 1.0), ("a", ts(2), 1.0), ("a", ts(3), 1.0),
      ("a", ts(4), 9.0), ("a", ts(5), 9.0),
      ("b", ts(1), 4.0), ("b", ts(2), 4.0),
      ("c", ts(1), 7.0)
    ).toDF("k", "ts", "value")
    val out = Timeseries.levelShift(ev, "k", "ts", "value")
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[java.sql.Date]("boundary_day").toString,
          r.getAs[Double]("mean_before"), r.getAs[Double]("mean_after"),
          r.getAs[Double]("shift")))).toMap
    assert(out("a") == (("2024-01-03", 1.0, 9.0, 8.0)))
    assert(out("b") == (("2024-01-01", 4.0, 4.0, 0.0)), "flat series ties to earliest")
    assert(!out.contains("c"), "single-day keys have no interior boundary")
  }

  test("decayedScore halves per half-life bucket, excludes stale and future rows") {
    val asOf = Timestamp.valueOf("2024-01-10 00:00:00")
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-09 12:00:00"), 8.0), // age 0.5d → bkt 0, w 1
      (1L, Timestamp.valueOf("2024-01-08 12:00:00"), 8.0), // age 1.5d → bkt 1, w 1/2
      (1L, Timestamp.valueOf("2024-01-06 00:00:00"), 8.0), // age 4d   → bkt 4, w 1/16
      (1L, Timestamp.valueOf("2024-01-11 00:00:00"), 99.0), // future: dropped
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 5.0)  // age 9d ≥ 3 buckets: dropped
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.decayedScore(ev, "user_id", "ts", "value", asOf,
        halflifeSeconds = 86400L, maxBuckets = 3)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("decayed_score")))).toMap
    // bkt 4 exceeds maxBuckets=3 → third event dropped too
    assert(out == Map(1L -> ((2L, 8.0 + 4.0))))
  }

  test("decayedScore at-asOf event gets full weight (bucket 0, <= semantics)") {
    val asOf = Timestamp.valueOf("2024-01-10 00:00:00")
    val ev = Seq((1L, asOf, 2.5)).toDF("user_id", "ts", "value")
    val out = Timeseries.decayedScore(ev, "user_id", "ts", "value", asOf,
      halflifeSeconds = 3600L).collect()
    assert(out.head.getAs[Double]("decayed_score") == 2.5)
  }
}
