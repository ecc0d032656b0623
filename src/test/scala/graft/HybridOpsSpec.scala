package graft

import java.sql.Timestamp
import graft.llmdata.{DedupOps, Similarity}
import graft.operators.AggMerge
import org.apache.spark.sql.functions._

/** RRF fusion, truncated-dim rerank, algebraic aggregate merge, and
  * ingestion-order novelty. */
class HybridOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse sums reciprocal ranks, missing side contributes zero") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Similarity.rrfFuse(a, b, "id", kRrf = 60, topN = 10)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getDouble(3), r.getInt(4)))).toMap
    // 20 is in both lists: 1/62 + 1/61
    assert(out(20L)._3 == 1.0 / 62 + 1.0 / 61)
    assert(out(20L)._4 == 1, "double-listed id wins")
    assert(out(10L) == ((Some(1L), None, 1.0 / 61, 2)))
    assert(out(40L)._1.isEmpty && out(40L)._3 == 1.0 / 62)
    assert(out.size == 4)
  }

  test("rrfFuse breaks score ties by id") {
    // rank 1 in a only vs rank 1 in b only: identical scores
    val a = Seq((7L, 1)).toDF("id", "rank")
    val b = Seq((3L, 1)).toDF("id", "rank")
    val out = Similarity.rrfFuse(a, b, "id", 60, 10)
      .collect().map(r => (r.getLong(0), r.getInt(4)))
    assert(out.toSeq.sortBy(_._2) == Seq((3L, 1), (7L, 2)))
  }

  test("truncatedRerank reranks the overfetched candidates exactly") {
    // query q: prefix dims favor v2, full vector favors v1 — with
    // overfetch covering both, the exact rerank must put v1 first
    val q = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.6f, 0f, 0.8f, 0f)),   // prefix-2 cos: 0.6; full: 0.6
      (2L, Array(0.7f, 0f, -0.71f, 0f)), // prefix-2 cos: 0.7; full: ~0.70
      (3L, Array(0.1f, 0.9f, 0f, 0f)),
      (100L, Array(1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val full = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    val out = Similarity.truncatedRerank(corpus, q, "vec_id", "embedding",
        dPrefix = 2, overfetch = 2, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    assert(out == full, s"overfetch 2*k covers the swap: $out vs $full")
  }

  test("truncatedRerank with overfetch 1 can only reorder the coarse list") {
    val q = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.9f, 0f, 0f, 0f)),
      (2L, Array(0.8f, 0f, 0.6f, 0f)),
      (3L, Array(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.truncatedRerank(corpus, q, "vec_id", "embedding",
      dPrefix = 2, overfetch = 1, k = 2).collect()
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  private def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")

  test("AggMerge: merged history+delta partials equal the direct aggregate") {
    val ev = Seq(
      (ts(1, 1), 1.25), (ts(1, 2), -0.5), (ts(2, 3), 3.75),
      (ts(2, 4), 0.125), (ts(3, 5), 9.0), (ts(3, 6), -2.25)
    ).toDF("ts", "value")
    val direct = AggMerge.finish(AggMerge.dailyPartial(ev, "ts", "value"))
    val prev = AggMerge.dailyPartial(ev.filter(to_date(col("ts")) <= lit("2024-03-02")), "ts", "value")
    val delta = AggMerge.dailyPartial(ev.filter(to_date(col("ts")) > lit("2024-03-02")), "ts", "value")
    val merged = AggMerge.finish(AggMerge.merge(Seq(prev, delta)))
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(key(merged) == key(direct))
    assert(key(direct)("2024-03-01") == ((2L, 0.75, -0.5, 1.25)))
  }

  test("AggMerge: a day split ACROSS partials re-merges correctly") {
    val ev = Seq((ts(1, 1), 1.0), (ts(1, 2), 2.0), (ts(1, 3), 4.0))
      .toDF("ts", "value")
    // split mid-day: the day-1 partial exists on both sides
    val p1 = AggMerge.dailyPartial(ev.filter(hour(col("ts")) <= 1), "ts", "value")
    val p2 = AggMerge.dailyPartial(ev.filter(hour(col("ts")) > 1), "ts", "value")
    val merged = AggMerge.finish(AggMerge.merge(Seq(p1, p2))).collect()
    assert(merged.length == 1)
    val r = merged.head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 7.0
      && r.getDouble(3) == 1.0 && r.getDouble(4) == 4.0)
  }

  test("AggMerge.applyCdc equals a direct recompute across all retraction regimes") {
    // day 1: delete a NON-extreme row (pure algebraic retraction)
    // day 2: delete the stored MAX (rebuild path)
    // day 3: delete every row (day must vanish)
    // day 4: insert-only new day; plus an insert landing on day 1
    val base = Seq(
      (1L, ts(1, 1), 1.0), (2L, ts(1, 2), 5.0), (3L, ts(1, 3), 9.0),
      (4L, ts(2, 1), 2.0), (5L, ts(2, 2), 8.0),
      (6L, ts(3, 1), 4.0), (7L, ts(3, 2), 6.0)
    ).toDF("event_id", "ts", "value")
    val stored = AggMerge.dailyPartial(base, "ts", "value")
    val cdc = Seq(
      ("delete", 2L, ts(1, 2), 5.0),
      ("delete", 5L, ts(2, 2), 8.0),
      ("delete", 6L, ts(3, 1), 4.0), ("delete", 7L, ts(3, 2), 6.0),
      ("insert", 100L, ts(1, 5), -3.5), ("insert", 101L, ts(4, 1), 7.25)
    ).toDF("op", "event_id", "ts", "value")
    val out = AggMerge.finish(
      AggMerge.applyCdc(stored, base, cdc, "event_id", "ts", "value"))
    val newState = Seq(
      (1L, ts(1, 1), 1.0), (3L, ts(1, 3), 9.0), (4L, ts(2, 1), 2.0),
      (100L, ts(1, 5), -3.5), (101L, ts(4, 1), 7.25)
    ).toDF("event_id", "ts", "value")
    val direct = AggMerge.finish(AggMerge.dailyPartial(newState, "ts", "value"))
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (o, dct) = (key(out), key(direct))
    assert(o == dct, s"applyCdc $o vs direct $dct")
    assert(!o.contains("2024-03-03"), "fully-deleted day vanishes")
    assert(o("2024-03-01") == ((3L, 6.5, -3.5, 9.0)), "day-1 insert lands; non-extreme delete retracted")
    assert(o("2024-03-02") == ((1L, 2.0, 2.0, 2.0)), "extreme-delete day rebuilt")
    assert(o("2024-03-04") == ((1L, 7.25, 7.25, 7.25)), "insert-only new day")
  }

  test("AggMerge.applyCdc with an empty delete batch degrades to plain merge") {
    val base = Seq((1L, ts(1, 1), 1.0), (2L, ts(2, 1), 2.0))
      .toDF("event_id", "ts", "value")
    val stored = AggMerge.dailyPartial(base, "ts", "value")
    val cdc = Seq(("insert", 10L, ts(2, 5), 4.0))
      .toDF("op", "event_id", "ts", "value")
    val out = AggMerge.finish(
      AggMerge.applyCdc(stored, base, cdc, "event_id", "ts", "value"))
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map("2024-03-01" -> ((1L, 1.0)), "2024-03-02" -> ((2L, 6.0))))
  }

  test("AggMerge HLL: merged distinct partials equal the direct sketch, replay-idempotent") {
    val ev = (1 to 200).map(i =>
      (ts(1 + i % 3, i % 24), s"user${i % 57}")).toDF("ts", "uid")
    val direct = AggMerge.finishDistinct(
      AggMerge.dailyDistinctPartial(ev, "ts", "uid"))
    val prev = AggMerge.dailyDistinctPartial(
      ev.filter(to_date(col("ts")) <= lit("2024-03-02")), "ts", "uid")
    val delta = AggMerge.dailyDistinctPartial(
      ev.filter(to_date(col("ts")) > lit("2024-03-02")), "ts", "uid")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val merged = AggMerge.finishDistinct(AggMerge.mergeDistinct(Seq(prev, delta)))
    assert(key(merged) == key(direct),
      "register-max union must reproduce the direct sketch's estimates")
    // replay idempotence: merging the SAME delta twice changes nothing
    // (unlike SUM/COUNT partials — max is idempotent)
    val replayed = AggMerge.finishDistinct(
      AggMerge.mergeDistinct(Seq(prev, delta, delta)))
    assert(key(replayed) == key(direct))
    // at this cardinality (<= 57/day) the sketch is still exact
    val exact = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("uid")).as("n")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(key(direct) == exact, s"${key(direct)} vs $exact")
  }

  test("batchNovelty measures marginal windows against the corpus only") {
    val corpus = Seq(1L -> "a b c d e f g h i j").toDF("doc_id", "text")
    val batch = Seq(
      10L -> "a b c d e f g h i j",               // all 3 windows known
      11L -> "z y x w v u t s r q",               // all 3 windows new
      12L -> "a b c d e f g h z z z z z z z"      // 1 of 8 known
    ).toDF("doc_id", "text")
    val out = graft.llmdata.DedupOps.batchNovelty(corpus, batch,
        "doc_id", "text", windowSize = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(10L) == ((3L, 0L, 0.0)))
    assert(out(11L) == ((3L, 3L, 1.0)))
    assert(out(12L) == ((8L, 7L, 7.0 / 8.0)))
    // batch-internal duplicates must NOT make each other "seen": 10 and
    // a copy of it still both read novelty 0 only because of the CORPUS
    val out2 = graft.llmdata.DedupOps.batchNovelty(
      Seq(1L -> "completely unrelated corpus text here now ok fine yes")
        .toDF("doc_id", "text"),
      Seq(10L -> "a b c d e f g h i j", 11L -> "a b c d e f g h i j")
        .toDF("doc_id", "text"),
      "doc_id", "text", windowSize = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out2 == Map(10L -> 1.0, 11L -> 1.0),
      "a batch-internal duplicate is still NEW relative to the corpus")
  }

  test("noveltyByOrder attributes windows to the smallest doc id") {
    val base = "a b c d e f g h i j"        // 3 distinct 8-gram windows
    val docs = Seq(
      1L -> base,
      2L -> base,                            // full copy: novelty 0
      3L -> "a b c d e f g h z z z z z z z" // shares exactly window 1
    ).toDF("doc_id", "text")
    val out = DedupOps.noveltyByOrder(docs, "doc_id", "text", windowSize = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L)._1 == 8L && out(3L)._2 == 7L, "one shared window")
  }
}
