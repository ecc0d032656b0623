package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pointInInterval matches exactly the contained points, each once") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:15:00")), // overlaps 1
      (3L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:01:00"))
    ).toDF("iv_id", "start", "end")
    val points = Seq(
      (10L, ts("2024-01-01 10:07:00")), // in 1 AND 2
      (11L, ts("2024-01-01 10:12:00")), // in 2 only
      (12L, ts("2024-01-01 10:00:00")), // boundary: inclusive start of 1
      (13L, ts("2024-01-01 11:00:00"))  // in none
    ).toDF("pt_id", "pt_ts")
    val out = RangeJoin.pointInInterval(points, intervals,
        "pt_ts", "start", "end", bucketSeconds = 300)
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "no duplicate pairs")
    assert(out.toSet == Set((1L, 10L), (2L, 10L), (2L, 11L), (1L, 12L)))
  }

  test("the plan is a hash equi-join on buckets, not a nested loop") {
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("iv_id", "start", "end")
    val points = Seq((2L, ts("2024-01-01 00:30:00"))).toDF("pt_id", "pt_ts")
    val plan = RangeJoin.pointInInterval(points, intervals,
      "pt_ts", "start", "end", bucketSeconds = 600).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join must not nested-loop:\n$plan")
    assert(plan.contains("Join"), plan)
  }

  test("agrees with the exact theta join on generated data") {
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    val intervals = (1L to 40L).map(i =>
        (i, new Timestamp((base + i * 137) * 1000), new Timestamp((base + i * 137 + 90) * 1000)))
      .toDF("iv_id", "start", "end")
    val points = (100L to 400L).map(i => (i, new Timestamp((base + (i - 100) * 17) * 1000)))
      .toDF("pt_id", "pt_ts")
    val bucketed = RangeJoin.pointInInterval(points, intervals,
        "pt_ts", "start", "end", bucketSeconds = 60)
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val theta = points.join(intervals,
        col("pt_ts") >= col("start") && col("pt_ts") <= col("end"))
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == theta)
  }
}
