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

  test("tagSkewSafe ≡ tag across day seams, gaps, ties, and absent days") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user a: session crossing midnight (23:59 -> 00:05, gap 6 min)
      ("a", 1L, t("2024-01-01 23:50:00")), ("a", 2L, t("2024-01-01 23:59:00")),
      ("a", 3L, t("2024-01-02 00:05:00")),
      // ... then a real gap the same day -> new session
      ("a", 4L, t("2024-01-02 09:00:00")),
      // ... and a seam that does NOT stitch (day 3 starts cold)
      ("a", 5L, t("2024-01-03 09:00:00")),
      // user b: equal timestamps at the seam, tie-broken by event_id
      ("b", 6L, t("2024-01-01 23:59:59")), ("b", 7L, t("2024-01-01 23:59:59")),
      ("b", 8L, t("2024-01-02 00:00:01")),
      // user c: single event
      ("c", 9L, t("2024-01-02 12:00:00"))
    ).toDF("user_id", "event_id", "ts")
    for (gap <- Seq(1800L, 3L * 86400)) { // 30 min; and > 1 day so the
      // 2-day absent-day seam (a4 -> a5 via no events on the calendar
      // gap) must STITCH under the large gap and split under the small
      val exact = Sessionize.tag(events, "user_id", "ts", gap, "event_id")
        .select("user_id", "event_id", "session_index")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val safe = Sessionize.tagSkewSafe(events, "user_id", "ts", gap, "event_id")
        .select("user_id", "event_id", "session_index")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(safe == exact, s"gap=$gap: $safe vs $exact")
    }
    // pin the interesting values once (30-min gap): midnight stitched,
    // intra-day gap split, cold day-3 start split
    val pinned = Sessionize.tagSkewSafe(events, "user_id", "ts", 1800L, "event_id")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_index")).toMap
    assert(pinned == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      6L -> 1L, 7L -> 1L, 8L -> 1L, 9L -> 1L), s"got $pinned")
  }

  test("tagSkewSafe partitions the event sort by (key, day), not key alone") {
    val events = Seq(("a", 1L, ts(0)), ("a", 2L, ts(10)))
      .toDF("user_id", "event_id", "ts")
    val plan = Sessionize.tagSkewSafe(events, "user_id", "ts", 1800L, "event_id")
      .queryExecution.executedPlan.toString
    // the event-stream exchange must key on the day too — that IS the
    // skew bound (heaviest partition = one key-day, not one key)
    assert(plan.contains("hashpartitioning(user_id") &&
      plan.linesIterator.exists(l => l.contains("hashpartitioning(user_id")
        && l.contains("__day")),
      s"expected a (user_id, __day) exchange in:\n$plan")
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

  test("assembleSequences orders by (ts, tie) regardless of input order") {
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 10:00:$s%02d")
    // arrival order scrambled; two events share ts(5) → event_id breaks
    val ev = Seq(
      (7L, ts(9), 3L, "C"), (7L, ts(5), 2L, "B"), (7L, ts(5), 1L, "A"),
      (8L, ts(1), 4L, "X")).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Sessionize
      .assembleSequences(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(7L) == ((3L, "A->B->C")))
    assert(out(8L) == ((1L, "X")))
    val shuffled = graft.operators.Sessionize
      .assembleSequences(ev.orderBy(org.apache.spark.sql.functions.rand(42)),
        "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(shuffled == out, "assembly must be input-order invariant")
  }

  test("pathNgrams windows stay inside sessions, top-k ranks by count then path") {
    val events = Seq(
      // a session 1: view click buy  → one 3-gram
      ("a", 1L, ts(0), "view"), ("a", 2L, ts(1), "click"), ("a", 3L, ts(2), "buy"),
      // a session 2 (gap): view click buy again → same path counted twice
      ("a", 4L, ts(50), "view"), ("a", 5L, ts(51), "click"), ("a", 6L, ts(52), "buy"),
      // b: view click | (gap) buy — no 3-gram crosses the boundary
      ("b", 7L, ts(0), "view"), ("b", 8L, ts(1), "click"), ("b", 9L, ts(55), "buy")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.operators.Sessionize.pathNgrams(events, "user_id", "ts",
        "event_id", "event_type", gapSeconds = 1800L, n = 3, topK = 5)
      .collect().map(r => r.getAs[String]("path") ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Int]("rank")))).toMap
    assert(out == Map("view > click > buy" -> ((2L, 1))),
      s"boundary-crossing windows must vanish: $out")
  }
}
