package graft

import java.sql.Timestamp
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("gap sessionization splits on gaps, aggregates per session") {
    val events = Seq(
      ("a", 1L, ts(0)), ("a", 2L, ts(10)),  // session 1: 10:00-10:10
      ("a", 3L, ts(50)),                    // 40-min gap → session 2
      ("b", 4L, ts(5))                      // single-event session
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize.byGap(events, "user_id", "ts", gapSeconds = 1800, "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))).toMap
    assert(out.size == 3)
    assert(out(("a", 1L)) == ((ts(0), ts(10), 2L)))
    assert(out(("a", 2L)) == ((ts(50), ts(50), 1L)))
    assert(out(("b", 1L)) == ((ts(5), ts(5), 1L)))
  }

  test("a gap of exactly gapSeconds does NOT split (strictly-greater rule)") {
    val events = Seq(("a", 1L, ts(0)), ("a", 2L, ts(30)))
      .toDF("user_id", "event_id", "ts")
    val out = Sessionize.byGap(events, "user_id", "ts", gapSeconds = 1800, "event_id")
    assert(out.count() == 1, "30-min gap at a 30-min threshold stays one session")
    assert(out.first().getAs[Long]("n_events") == 2L)
  }

  test("equal timestamps are ordered by the tie-break column deterministically") {
    val events = Seq(("a", 2L, ts(0)), ("a", 1L, ts(0)), ("a", 3L, ts(45)))
      .toDF("user_id", "event_id", "ts")
    val out = Sessionize.byGap(events, "user_id", "ts", gapSeconds = 1800, "event_id")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("transitions count within-session successors only, shares sum to 1") {
    val events = Seq(
      // user a, one session: view -> click -> view
      ("a", 1L, ts(0), "view"), ("a", 2L, ts(1), "click"), ("a", 3L, ts(2), "view"),
      // user a, NEW session (big gap): view alone — no transition emitted
      ("a", 4L, ts(7200), "view"),
      // user b: view -> view
      ("b", 5L, ts(0), "view"), ("b", 6L, ts(1), "view")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Sessionize.transitions(events, "user_id", "ts", "event_type",
        gapSeconds = 1800, tieBreakCol = "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "view") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 1.0))),
      s"session boundary must cut the a3 -> a4 transition: $out")
  }
}
