package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.incremental.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int = 0) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("resequence builds the version chain, collapsing no-change rows") {
    val rows = Seq(
      (1L, "gold", ts(1)), (1L, "gold", ts(3)),   // no-change → collapses
      (1L, "silver", ts(5)), (1L, "gold", ts(9)), // real transitions
      (2L, "bronze", ts(2))
    ).toDF("user_id", "tier", "ts")
    val out = Scd2.resequence(rows, "user_id", Seq("tier"), "ts")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "gold", ts(1), Some(ts(5)), false),
      (1L, "silver", ts(5), Some(ts(9)), false),
      (1L, "gold", ts(9), None, true),
      (2L, "bronze", ts(2), None, true)))
  }

  test("merge of a snapshot plus later updates equals full resequence") {
    val all = Seq(
      (1L, "a", ts(1)), (1L, "b", ts(4)), (1L, "a", ts(20)),
      (2L, "x", ts(2)), (2L, "x", ts(22)),  // late no-change update
      (3L, "q", ts(21))                     // new key arrives in batch 2
    ).toDF("user_id", "attr", "ts")
    val cur = Scd2.resequence(all.filter($"ts" < ts(15)), "user_id", Seq("attr"), "ts")
    val merged = Scd2.merge(cur, all.filter($"ts" >= ts(15)), "user_id", Seq("attr"), "ts")
    val direct = Scd2.resequence(all, "user_id", Seq("attr"), "ts")
    assert(merged.collect().toSet == direct.collect().toSet)
    assert(merged.filter($"is_current").count() == 3, "one open row per key")
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val all = Seq((1L, "a", ts(1)), (1L, "b", ts(4))).toDF("user_id", "attr", "ts")
    val once = Scd2.merge(
      Scd2.resequence(all, "user_id", Seq("attr"), "ts"),
      all, "user_id", Seq("attr"), "ts")
    assert(once.collect().toSet ==
      Scd2.resequence(all, "user_id", Seq("attr"), "ts").collect().toSet)
  }

  test("out-of-order update re-derives history instead of corrupting it") {
    val first = Seq((1L, "b", ts(10))).toDF("user_id", "attr", "ts")
    val cur = Scd2.resequence(first, "user_id", Seq("attr"), "ts")
    // an update OLDER than the open row arrives late
    val late = Seq((1L, "a", ts(2))).toDF("user_id", "attr", "ts")
    val out = Scd2.merge(cur, late, "user_id", Seq("attr"), "ts")
      .collect().map(r => (r.getString(1), Option(r.getTimestamp(3)))).toSet
    assert(out == Set(("a", Some(ts(10))), ("b", None)),
      "late row becomes the closed first version; open row survives")
  }
}
