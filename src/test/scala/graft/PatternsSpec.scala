package graft

import java.sql.Timestamp
import graft.operators.{Attribution, Patterns, Retention}

class PatternsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-$d%02d 10:$m%02d:00")

  test("cohortRevenue: LTV divides by the FIRST-week cohort size, not actives") {
    val ev = Seq(
      // cohort of 2 users (both first-seen in week of Jan 1)
      (1L, ts(2, 0), 10.0), (2L, ts(3, 0), 30.0),
      // week 1: only user 1 returns — denominator must stay 2
      (1L, ts(9, 0), 6.0)
    ).toDF("user_id", "ts", "value")
    val out = graft.operators.Retention.cohortRevenue(ev, "user_id", "ts", "value")
      .collect().map(r => r.getAs[Int]("week_index") ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("revenue"), r.getAs[Double]("cum_revenue"),
          r.getAs[Double]("ltv_per_user")))).toMap
    assert(out(0) == ((2L, 2L, 40.0, 40.0, 20.0)))
    assert(out(1) == ((1L, 2L, 6.0, 46.0, 23.0)),
      "cumulative revenue, churn-proof denominator")
  }

  test("rfm buckets each dimension independently, bucket 1 = best") {
    val ev = Seq(
      // u1: recent, frequent, big spender — 1/1/1
      (1L, ts(9, 0), 10.0), (1L, ts(9, 1), 10.0), (1L, ts(9, 2), 10.0),
      // u2: old single small event — 2/2/2
      (2L, ts(1, 0), 1.0),
      // u3: recent but one mid event — r=1, f=2, m=1 (2 users per bucket
      // at nBuckets=2 over 4 users; ties by user id)
      (3L, ts(8, 0), 5.0),
      // u4: old, two events, small total
      (4L, ts(2, 0), 0.5), (4L, ts(2, 1), 0.5)
    ).toDF("user_id", "ts", "value")
    val out = graft.operators.Retention.rfm(ev, "user_id", "ts", "value",
        nBuckets = 2)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("r"), r.getAs[Int]("f"), r.getAs[Int]("m"),
          r.getAs[String]("rfm_segment")))).toMap
    assert(out(1L) == ((1, 1, 1, "111")), "champion")
    assert(out(2L) == ((2, 2, 2, "222")), "lost")
    assert(out(3L) == ((1, 2, 1, "121")))
    assert(out(4L) == ((2, 1, 2, "212")), "frequency 2 ties u1's bucket")
  }

  test("basketPairs counts co-occurrence per session with exact measures") {
    val ev = Seq(
      // u1 session 1: view+click+view (dup type dedups in the basket)
      (1L, 10L, ts(1, 0), "view"), (1L, 11L, ts(1, 5), "click"),
      (1L, 12L, ts(1, 9), "view"),
      // u1 session 2 (gap > 10 min): click only — singleton basket
      (1L, 13L, ts(1, 30), "click"),
      // u2 session 1: view+purchase
      (2L, 20L, ts(2, 0), "view"), (2L, 21L, ts(2, 3), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Patterns.basketPairs(ev, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 600L)
      .collect().map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_ab"),
          r.getAs[Long]("n_baskets"), r.getAs[Double]("support"),
          r.getAs[Double]("lift")))).toMap
    // 3 baskets: {view,click}, {click}, {view,purchase}
    assert(out.keySet == Set(("click", "view"), ("purchase", "view")))
    assert(out(("click", "view")) ==
      ((2L, 2L, 1L, 3L, 1.0 / 3, 3.0 / 4)), "lift = n_ab*n / (n_a*n_b)")
    assert(out(("purchase", "view")) == ((1L, 2L, 1L, 3L, 1.0 / 3, 3.0 / 2)))
  }

  test("lastTouch credits the latest in-window touch, else organic") {
    val ev = Seq(
      // u1: view then click then purchase — click is last touch
      (1L, 10L, ts(1, 0), "view", 0.0), (1L, 11L, ts(1, 5), "click", 0.0),
      (1L, 12L, ts(1, 9), "purchase", 10.0),
      // u1 second purchase: latest touch (the same click) now outside
      // the 10-minute lookback → organic
      (1L, 13L, ts(1, 30), "purchase", 20.0),
      // u2: touch AFTER the purchase only → organic
      (2L, 20L, ts(2, 5), "purchase", 5.0), (2L, 21L, ts(2, 9), "view", 0.0),
      // u3: same-instant touch is visible (<= semantics); larger touch
      // id wins the tie between simultaneous touches
      (3L, 31L, ts(3, 0), "view", 0.0), (3L, 32L, ts(3, 0), "click", 0.0),
      (3L, 33L, ts(3, 0), "purchase", 7.5)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val att = Attribution.lastTouch(ev, "user_id", "ts", "event_type",
      "event_id", Seq("view", "click"), "purchase", lookbackSeconds = 600L)
    val out = att.collect().map(r => r.getAs[Long]("event_id") ->
      ((r.getAs[String]("channel"), Option(r.getAs[java.lang.Long]("touch_id"))))).toMap
    assert(out(12L) == (("click", Some(11L))))
    assert(out(13L) == (("organic", None)), "stale touch falls outside lookback")
    assert(out(20L) == (("organic", None)), "future touches never credit")
    assert(out(33L) == (("click", Some(32L))), "same-instant tie: largest touch id")
    val report = Attribution.channelReport(att, "value")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(report == Map("click" -> ((2L, 17.5)), "organic" -> ((2L, 25.0))))
  }

  test("matchSequence renders the total-order journey and matches the regex") {
    val ev = Seq(
      (1L, 10L, ts(1), "signup"), (1L, 11L, ts(2), "view"),
      (1L, 12L, ts(3), "purchase"),
      (2L, 20L, ts(1), "view"), (2L, 21L, ts(2), "signup"),
      // same-instant tie broken by event_id: 31 then 32
      (3L, 32L, ts(1), "purchase"), (3L, 31L, ts(1), "signup")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Patterns.matchSequence(ev, "user_id", "ts", "event_id",
        "event_type", "^signup.*purchase$")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(out(1L) == (("signup view purchase", true)))
    assert(out(2L) == (("view signup", false)), "journey must not start mid-string")
    assert(out(3L) == (("signup purchase", true)), "ties ordered by event_id")
  }

  test("rollingActive counts distinct users in the trailing window") {
    val ev = Seq(
      (1L, ts(1)), (1L, ts(1, 30)), // same user+day counts once
      (2L, ts(2)),
      (1L, ts(10))                  // outside day-2..8 window
    ).toDF("user_id", "ts")
    val out = Retention.rollingActive(ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out("2024-01-01") == 1L)
    assert(out("2024-01-02") == 2L, "users 1 and 2 both active in window")
    assert(out("2024-01-07") == 2L, "day 1 still inside the 7-day trail")
    assert(out("2024-01-08") == 1L, "day 1 fell out; only user 2's day-2 remains")
    assert(out("2024-01-10") == 1L)
    assert(!out.contains("2023-12-31") && !out.contains("2024-01-11"),
      "report days clamp to the observed span")
  }

  test("stickiness is DAU over trailing-window AU, truncated at stream start") {
    val ev = Seq(
      (1L, ts(1)), (2L, ts(1)), // day 1: u1 u2
      (1L, ts(2)),              // day 2: u1
      (3L, ts(3))               // day 3: u3
    ).toDF("user_id", "ts")
    val out = Retention.stickiness(ev, "user_id", "ts", windowDays = 2)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("2024-01-01") == ((2L, 2L, 1.0)), "first day: window is itself")
    assert(out("2024-01-02") == ((1L, 2L, 0.5)), "u1 today over {u1,u2} in trail")
    assert(out("2024-01-03") == ((1L, 2L, 0.5)), "u3 today over {u1,u3} in trail")
  }
}
