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
}
