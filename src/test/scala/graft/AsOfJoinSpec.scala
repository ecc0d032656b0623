package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("asOf picks the latest right row at or before each left row, per key") {
    val left = Seq((1L, 1, ts(100)), (2L, 1, ts(250)), (3L, 1, ts(50)), (4L, 2, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1, ts(90), 1.0), (11L, 1, ts(200), 2.0), (12L, 1, ts(100), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.get(r.fieldIndex("asof_event_id"))), Option(r.get(r.fieldIndex("asof_value")))))
      .toMap
    assert(out(1L) == (Some(12L), Some(3.0))) // same-instant right row visible (<=), id 12 beats 10
    assert(out(2L) == (Some(11L), Some(2.0))) // latest prior
    assert(out(3L) == (None, None))           // nothing at or before ts=50
    assert(out(4L) == (None, None))           // other key — no leakage
  }

  test("asOfForward picks the earliest right row at or after each left row") {
    val left = Seq((1L, 1, ts(100)), (2L, 1, ts(250)), (3L, 1, ts(300)), (4L, 2, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1, ts(100), 1.0), (11L, 1, ts(100), 2.0), // simultaneous pair
      (12L, 1, ts(260), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.asOfForward(left, right, "user_id", "ts", "event_id", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.get(r.fieldIndex("asof_event_id"))), Option(r.get(r.fieldIndex("asof_value")))))
      .toMap
    assert(out(1L) == (Some(10L), Some(1.0)),
      "same-instant right visible (>=); SMALLEST id wins the tie")
    assert(out(2L) == (Some(12L), Some(3.0))) // nearest future
    assert(out(3L) == (None, None))           // nothing at or after ts=300
    assert(out(4L) == (None, None))           // other key — no leakage
  }
}
