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

  test("intervalOverlap matches pairs exactly once across bucket spans") {
    // a1 spans 3 buckets and overlaps b1 in 2 of them — the
    // first-overlap-bucket rule must emit the pair exactly once
    val a = Seq(
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 02:50:00")),
      (2L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:30:00"))
    ).toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:30:00")), // ∩ a1
      (11L, ts("2024-01-01 02:50:00"), ts("2024-01-01 04:00:00")), // touches a1 end
      (12L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:59:00"))  // ∩ nothing
    ).toDF("b_id", "b_start", "b_end")
    val rows = RangeJoin.intervalOverlap(a, b, "a_start", "a_end",
        "b_start", "b_end", bucketSeconds = 3600)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length, "no duplicate pairs")
    assert(rows.toSet == Set((1L, 10L), (1L, 11L)),
      "closed-interval touch counts; disjoint pairs do not")
  }

  test("intervalOverlap agrees with the exact theta join on generated data") {
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    val a = (1L to 60L).map(i =>
        (i, new Timestamp((base + i * 211) * 1000),
          new Timestamp((base + i * 211 + 150) * 1000)))
      .toDF("a_id", "a_start", "a_end")
    val b = (100L to 200L).map(i =>
        (i, new Timestamp((base + (i - 100) * 97) * 1000),
          new Timestamp((base + (i - 100) * 97 + 60) * 1000)))
      .toDF("b_id", "b_start", "b_end")
    val bucketed = RangeJoin.intervalOverlap(a, b, "a_start", "a_end",
        "b_start", "b_end", bucketSeconds = 120)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val theta = a.join(b,
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.length == bucketed.distinct.length)
    assert(bucketed.toSet == theta)
  }
}
