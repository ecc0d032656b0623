package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llmdata.{DedupOps, Sampling, Similarity, TextAnalysis}
import graft.operators.Funnel

/** Round-4 additions: BPE pair stats, BM25 scoring, scale-safe global
  * ntile, label centroids, duplicated-window coverage, event funnel. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bpePairCounts counts within-word adjacent char pairs, every occurrence") {
    val docs = Seq((1L, "aa ab"), (2L, "aab x")).toDF("doc_id", "text")
    // words: aa → [aa]; ab → [ab]; aab → [aa, ab]; x → too short
    val out = TextAnalysis.bpePairCounts(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("aa" -> 2L, "ab" -> 2L))
  }

  test("bm25IndexSearch over a materialized index equals live bm25TopK bit-exactly") {
    val docs = Seq((1L, "x x x y"), (2L, "x y z"), (3L, "y z z"), (4L, "w w"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bm25idx").toString + "/idx"
    TextAnalysis.bm25IndexBuild(spark, path, docs, "doc_id", "text")
    val live = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x", "z"), k = 5)
      .collect().map(r => (r.getString(0), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("dl"),
        r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSet
    val indexed = TextAnalysis.bm25IndexSearch(spark, path, Seq("x", "z"), k = 5)
      .collect().map(r => (r.getString(0), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("dl"),
        r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSet
    assert(indexed == live, s"indexed $indexed vs live $live")
  }

  test("bm25IndexSearch pushes the term filter into the postings scan") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bm25idx2").toString + "/idx"
    TextAnalysis.bm25IndexBuild(spark, path, docs, "doc_id", "text")
    val plan = TextAnalysis.bm25IndexSearch(spark, path, Seq("x", "z"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term In-filter must reach the parquet scan:\n$plan")
  }

  test("bm25TopK matches the hand-computed score and ranks by it") {
    val docs = Seq((1L, "x x x y"), (2L, "x y z"), (3L, "y z z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 5)
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    val r1 = out(0)
    assert(r1.getAs[Long]("tf") == 3 && r1.getAs[Long]("df") == 2
      && r1.getAs[Long]("dl") == 4)
    // idf = 3/2; avgdl = 10/3; denom = 3 + 1.25*(0.25 + 0.75*4/(10/3))
    val expected = 1.5 * (3.0 * 2.25) / (3.0 + 1.25 * (0.25 + 0.75 * 4.0 / (10.0 / 3.0)))
    assert(r1.getAs[Double]("score") == expected, "score must be IEEE-exact")
    assert(out(0).getAs[Double]("score") > out(1).getAs[Double]("score"))
  }

  test("globalNtile is row-identical to the one-window ntile, ties included") {
    val df = Seq(
      (1L, 0.5), (2L, 0.5), (3L, 0.9), (4L, 0.1), (5L, 0.9),
      (6L, 0.5), (7L, 0.3), (8L, 0.7), (9L, 0.3), (10L, 0.5)
    ).toDF("id", "score")
    for (n <- Seq(1, 3, 4, 7, 15)) {
      val scalable = Sampling.globalNtile(df, "id", "score", n)
        .select($"id", $"bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val oneWindow = df.withColumn("bucket",
          ntile(n).over(Window.orderBy($"score".desc, $"id".asc)))
        .select($"id", $"bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(scalable == oneWindow, s"ntile($n) must match the window form")
    }
  }

  test("globalNtile plan has no corpus-wide single-partition window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val docs = spark.read.parquet(sf("documents"))
      .select($"doc_id", length($"text").cast("double").as("score"))
    val plan = Sampling.globalNtile(docs, "doc_id", "score", 4)
      .queryExecution.optimizedPlan
    val globalWindows = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(globalWindows.nonEmpty, "the cumulative-count window must exist")
    globalWindows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        "every unpartitioned window must sit over the distinct-score " +
          "aggregate, never over the corpus relation directly")
    }
  }

  test("labelCentroids computes exact per-label per-dim means") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f), 0), (2L, Seq(3.0f, 4.0f), 0), (3L, Seq(5.0f, 6.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(emb, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      (0, 0) -> (2L, 2.0), (0, 1) -> (2L, 3.0),
      (1, 0) -> (1L, 5.0), (1, 1) -> (1L, 6.0)))
  }

  test("duplicateWindowCoverage counts cross-doc duplicated windows only") {
    val docs = Seq(
      (1L, "a b c d"),   // grams: "a b c", "b c d"
      (2L, "a b c e"),   // grams: "a b c", "b c e"
      (3L, "x y z w"),   // unique grams
      (4L, "p q"),       // too short: no windows
      (5L, "m m m m m m")// within-doc repeat is NOT cross-doc duplication
    ).toDF("doc_id", "text")
    val out = DedupOps.duplicateWindowCoverage(docs, "doc_id", "text", n = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
    assert(out(5L) == ((4L, 0L, 0.0)), "same-doc repeats must not count")
  }

  test("dupSpanScrub merges overlapping/adjacent windows into maximal spans") {
    val docs = Seq(
      (1L, "x1 a b c x2 x3 a b c x4"), // "a b c" twice -> TWO spans
      (2L, "a b c y1 y2"),             // prefix span
      (3L, "z1 z2 z3"),                // unique: untouched
      (4L, "a b c"),                   // fully duplicated -> scrubs to ''
      (5L, "a b c"),
      (6L, "a b c d"),                 // "a b c" + "b c d" OVERLAP -> one span
      (7L, "b c d e"),                 // shares "b c d" with 6
      (8L, "")                         // empty doc: all zeros
    ).toDF("doc_id", "text")
    val out = DedupOps.dupSpanScrub(docs, "doc_id", "text", n = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((10L, 6L, 2L, "x1 x2 x3 x4")), s"got ${out(1L)}")
    assert(out(2L) == ((5L, 3L, 1L, "y1 y2")))
    assert(out(3L) == ((3L, 0L, 0L, "z1 z2 z3")), "unique doc is untouched")
    assert(out(4L) == ((3L, 3L, 1L, "")), "fully-dup doc scrubs to empty")
    assert(out(5L) == ((3L, 3L, 1L, "")))
    assert(out(6L) == ((4L, 4L, 1L, "")), "overlapping windows merge into ONE span")
    assert(out(7L) == ((4L, 3L, 1L, "e")))
    assert(out(8L) == ((0L, 0L, 0L, "")))
  }

  test("dupSpanScrub conservation and identity properties on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = DedupOps.dupSpanScrub(docs, "doc_id", "text", n = 8, minDf = 2)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, dup, spans, scrubbed) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      // conservation: surviving tokens + removed tokens == all tokens
      val kept = if (scrubbed.isEmpty) 0 else scrubbed.split(" ").length
      assert(kept + dup == n, s"doc ${r.getLong(0)}: $kept + $dup != $n")
      // spans are non-empty runs of >= n tokens each
      assert(spans <= dup / 8, s"each span covers >= 8 tokens: $spans vs $dup")
      assert((spans == 0) == (dup == 0))
    }
    // identity: a corpus with no cross-doc duplication is untouched
    val unique = Seq(
      (1L, (1 to 12).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val id = DedupOps.dupSpanScrub(unique, "doc_id", "text", n = 8, minDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(4)))).toMap
    assert(id(1L) == ((0L, (1 to 12).map(i => s"a$i").mkString(" "))))
    assert(id(2L)._1 == 0L)
  }

  test("funnel requires each step strictly after the previous reach time") {
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val events = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "click", ts(1)), (2L, "view", ts(2)),            // click precedes view
      (3L, "view", ts(1)), (3L, "purchase", ts(2)),          // skips click
      (4L, "purchase", ts(1)),                               // never enters
      (5L, "view", ts(1)), (5L, "click", ts(1))              // same instant: not after
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.conversion(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy($"step_index").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 4L), (2, "click", 1L), (3, "purchase", 1L)))
    assert(out(0).getDouble(3) == 1.0)
    assert(out(1).getDouble(3) == 0.25)
  }

  test("funnel reach times chain: a later-step event before reach is ignored") {
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val events = Seq(
      (1L, "click", ts(1)), (1L, "view", ts(2)), (1L, "click", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val reach = Funnel.reachTimes(events, "user_id", "ts", "event_type",
      Seq("view", "click")).collect()
    assert(reach.length == 1)
    assert(reach(0).getAs[java.sql.Timestamp]("t_2") == ts(3),
      "the click at t=1 precedes the first view and must not count")
  }
}
