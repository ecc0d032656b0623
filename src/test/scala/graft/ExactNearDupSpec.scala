package graft

import java.sql.Timestamp
import graft.llmdata.DedupOps
import graft.operators.Funnel

/** Prefix-filtered exact Jaccard join, length-blocked edit-distance
  * pairs, and the session-scoped funnel composition. */
class ExactNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def shingleSet(text: String): Set[String] =
    text.trim.toLowerCase.split("\\s+").toSeq
      .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet

  test("prefixJaccardPairs equals brute-force all-pairs (100% recall)") {
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",   // high overlap with 1
      3L -> "a b c d e f g h",   // identical to 1
      4L -> "z y x w v u t s",   // disjoint
      5L -> "a b c d q r s t",   // partial overlap
      6L -> "a b",               // too short: no shingles, must not appear
      7L -> "c d e f g h a b c d e f"
    ).toDF("doc_id", "text")
    val out = DedupOps.prefixJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, tNum = 1, tDen = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // brute force over the same shingle sets, same rational threshold
    val sets = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)
      .map(i => i -> shingleSet(Seq(
        "a b c d e f g h", "a b c d e f g x", "a b c d e f g h",
        "z y x w v u t s", "a b c d q r s t", "a b",
        "c d e f g h a b c d e f")(i.toInt - 1)))
      .filter(_._2.nonEmpty).toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      o = (sets(a) & sets(b)).size.toLong
      u = (sets(a) | sets(b)).size.toLong
      if 2 * o >= u
    } yield (a, b) -> ((o, u))).toMap
    assert(out == expected,
      s"prefix-filtered join must reproduce brute force exactly\n$out\n$expected")
    assert(expected.nonEmpty && expected.contains((1L, 3L)),
      "fixture sanity: the identical pair is present")
    assert(!out.keys.exists(p => p._1 == 6L || p._2 == 6L),
      "shingle-less doc never appears")
  }

  test("prefixJaccardPairs includes a pair at exactly the threshold") {
    // sets sized so o/u lands exactly on 1/2: |A|=|B|=6 shingles with 4
    // common -> o=4, u=8, 2*4 >= 8 holds with equality
    val a = "p q r s t u v w"        // shingles: pqr qrs rst stu tuv uvw (6)
    val b = "p q r s t u x y"        // shares pqr qrs rst stu (4); tux uxy
    val docs = Seq(10L -> a, 20L -> b).toDF("doc_id", "text")
    val sa = shingleSet(a); val sb = shingleSet(b)
    assert((sa & sb).size == 4 && (sa | sb).size == 8, "fixture is on-grid")
    val out = DedupOps.prefixJaccardPairs(docs, "doc_id", "text", 3, 1, 2)
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 4L
      && out.head.getLong(3) == 8L, ">= threshold keeps the boundary pair")
  }

  test("editDistancePairs finds exact distances and respects the bound") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat", // dist 3
      3L -> "the quick brown fox jumps over the lazy dog", // dist 0 to 1
      4L -> ("x" * 200),                                   // far from all
      5L -> "completely different text entirely here now"
    ).toDF("doc_id", "text")
    val out = DedupOps.editDistancePairs(docs, "doc_id", "text",
        maxDist = 5, bucketWidth = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 3L, (1L, 3L) -> 0L, (2L, 3L) -> 3L),
      s"got $out")
  }

  test("editDistancePairs recall across a bucket boundary, exactly-once") {
    // lengths 31 and 33 land in buckets 0 and 1 (width 32): only the
    // neighbor probe finds the pair, and it appears exactly once
    val a = "a" * 31
    val b = "a" * 33
    val docs = Seq(1L -> a, 2L -> b).toDF("doc_id", "text")
    val rows = DedupOps.editDistancePairs(docs, "doc_id", "text",
      maxDist = 5, bucketWidth = 32).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 2L, 2L)))
  }

  test("editDistancePairs excludes pairs whose length gap exceeds maxDist") {
    val docs = Seq(1L -> ("a" * 40), 2L -> ("a" * 50)).toDF("doc_id", "text")
    // same bucket (both len/32 == 1) but |40-50| = 10 > maxDist 5
    assert(DedupOps.editDistancePairs(docs, "doc_id", "text",
      maxDist = 5, bucketWidth = 32).count() == 0)
  }

  // long-document fixture: 60 distinct tokens per doc, near-pairs differ
  // by single-character edits inside one or two tokens — the regime the
  // blocked operator's scaladoc claims as its envelope (one changed
  // token's ±1 votes rarely cross a 60-token bit-sum's sign)
  private val longBase =
    (0 until 60).map(i => s"w${i}x${(i * 7) % 13}").mkString(" ")
  private val longDocs = Seq(
    1L -> longBase,
    2L -> longBase.replace("w5x9", "w5x8"),     // 1 char edit, 1 token
    3L -> longBase.replace("w11x12", "w11x19"), // 1-2 char edit elsewhere
    4L -> (0 until 60).map(i => s"q${i}z${(i * 5) % 11}").mkString(" "),
    5L -> "short text"                          // length-gap excluded
  )

  test("editDistancePairsBlocked ≡ exact editDistancePairs on long documents") {
    val docs = longDocs.toDF("doc_id", "text")
    def pairSet(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = pairSet(DedupOps.editDistancePairs(docs, "doc_id", "text",
      maxDist = 5, bucketWidth = 32))
    // wide Hamming budget: the envelope is total by construction here,
    // so the composition must reproduce the exact pair set
    val blocked = pairSet(DedupOps.editDistancePairsBlocked(docs, "doc_id",
      "text", maxDist = 5, maxHamming = 16))
    assert(exact.nonEmpty && exact.contains((1L, 2L)),
      s"fixture must contain near pairs: $exact")
    assert(blocked == exact, s"blocked $blocked vs exact $exact")
  }

  test("editDistancePairsBlocked at the production Hamming budget is a subset") {
    val docs = longDocs.toDF("doc_id", "text")
    def pairSet(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = pairSet(DedupOps.editDistancePairs(docs, "doc_id", "text",
      maxDist = 5, bucketWidth = 32))
    val blocked = pairSet(DedupOps.editDistancePairsBlocked(docs, "doc_id",
      "text", maxDist = 5, maxHamming = 3))
    // precision is exact (every emitted pair carries its true distance);
    // recall is the documented envelope
    assert(blocked.toSet.subsetOf(exact.toSet), s"blocked $blocked vs $exact")
    assert(blocked.contains((1L, 2L)),
      s"a single in-token edit on a 60-token doc must stay in the envelope: $blocked")
  }

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("pairSetAudit counts hits/misses/spurious over canonical pairs") {
    import spark.implicits._
    // truth: (1,2) (3,4) (5,6); candidate: (2,1) reversed + dup, (3,4), (7,8) spurious
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val cand = Seq((2L, 1L), (1L, 2L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val r = graft.llmdata.DedupOps.pairSetAudit(truth, cand).collect()(0)
    assert(r.getAs[Long]("n_truth") == 3L)
    assert(r.getAs[Long]("n_candidate") == 3L, "reversed dup canonicalizes away")
    assert(r.getAs[Long]("n_common") == 2L)
    assert(r.getAs[Long]("n_missed") == 1L)
    assert(r.getAs[Long]("n_spurious") == 1L)
    assert(r.getAs[Double]("recall") == 2.0 / 3)
    assert(r.getAs[Double]("precision") == 2.0 / 3)
  }

  test("pairSetAudit guards empty denominators") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = graft.llmdata.DedupOps.pairSetAudit(empty, cand).collect()(0)
    assert(r.getAs[Long]("n_truth") == 0L)
    assert(r.getAs[Double]("recall") == 0.0)
    assert(r.getAs[Double]("precision") == 0.0, "no common pairs")
  }

  test("sessionConversion scopes the funnel to gap-sessions") {
    val ev = Seq(
      // user 1: full funnel inside one 30-min-gap session
      (1L, 10L, ts(10, 0), "view"), (1L, 11L, ts(10, 5), "click"),
      (1L, 12L, ts(10, 10), "purchase"),
      // user 2: view, then a click 90 min later -> different session;
      // neither session converts past step 1
      (2L, 20L, ts(10, 0), "view"), (2L, 21L, ts(11, 30), "click"),
      // user 3: click BEFORE the first view in the same session -> the
      // strictly-after rule stops the funnel at step 1
      (3L, 30L, ts(10, 0), "click"), (3L, 31L, ts(10, 1), "view"),
      (3L, 32L, ts(10, 2), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.sessionConversion(ev, "user_id", "ts", "event_type",
        tieBreakCol = "event_id", gapSeconds = 1800,
        steps = Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1) == ((3L, 1.0)), "three sessions contain a view")
    assert(out(2) == ((1L, 1.0 / 3.0)), "only user 1's session clicks after viewing")
    assert(out(3) == ((1L, 1.0 / 3.0)), "user 3's purchase needs the click first")
  }

  test("windowed conversion drops steps that qualify only outside the gate") {
    val ev = Seq(
      // user 1: click 5 min after view — inside a 10-min gate
      (1L, 10L, ts(10, 0), "view"), (1L, 11L, ts(10, 5), "click"),
      // user 2: click 30 min after view — ordered, but too late
      (2L, 20L, ts(10, 0), "view"), (2L, 21L, ts(10, 30), "click"),
      // user 3: early click inside the gate, and the FIRST qualifying
      // click sets the next window (first-qualifying semantics)
      (3L, 30L, ts(10, 0), "view"), (3L, 31L, ts(10, 9), "click"),
      (3L, 32L, ts(10, 15), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val gated = Funnel.conversion(ev, "user_id", "ts", "event_type", steps,
        maxGapSeconds = Some(600L))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(gated == Map(1 -> 3L, 2 -> 2L, 3 -> 1L),
      "user 2's late click is out; user 3's purchase is 6 min after the click")
    val open = Funnel.conversion(ev, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(open == Map(1 -> 3L, 2 -> 3L, 3 -> 1L), "ungated keeps user 2")
  }

  test("stepGaps aggregates exact microsecond gaps between reach times") {
    val ev = Seq(
      (1L, 10L, ts(10, 0), "view"), (1L, 11L, ts(10, 1), "click"),
      (1L, 12L, ts(10, 2), "purchase"),
      (2L, 20L, ts(10, 0), "view"), (2L, 21L, ts(10, 3), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.stepGaps(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    // gaps to click: u1 60s, u2 180s; to purchase: u1 60s
    assert(out(2) == ((2L, 120e6, 60000000L, 180000000L)))
    assert(out(3) == ((1L, 60e6, 60000000L, 60000000L)))
  }

  test("sessionConversion vs whole-user funnel: the session split matters") {
    // one user whose view and click are in different sessions: lifetime
    // funnel converts step 2, session funnel must not
    val ev = Seq(
      (1L, 10L, ts(9, 0), "view"), (1L, 11L, ts(12, 0), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val lifetime = Funnel.conversion(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val session = Funnel.sessionConversion(ev, "user_id", "ts", "event_type",
      "event_id", 1800, Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(lifetime(2) == 1L && session(2) == 0L)
  }
}
