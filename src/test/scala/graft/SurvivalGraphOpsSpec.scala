package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Linkage, Profile, Retention, Timeseries}

/** Round-6 second wave: survival analysis, seasonality/autocorrelation/
  * CUSUM time-series ops, golden-record survivorship, segment overlap,
  * k-hop BFS, label propagation, link prediction, phrase search. */
class SurvivalGraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Kaplan-Meier -----------------------------------------------------

  test("kaplanMeier: hand-computed curve with censoring") {
    // stream end = day 10. censorDays = 2 -> last event on day 9/10 is
    // censored. Users: (first, last):
    //   u1 (1, 1)  lifetime 0, dead
    //   u2 (1, 3)  lifetime 2, dead
    //   u3 (2, 4)  lifetime 2, dead
    //   u4 (3, 9)  lifetime 6, censored
    //   u5 (1, 10) lifetime 9, censored
    val ev = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"), (2L, "2024-01-03"),
      (3L, "2024-01-02"), (3L, "2024-01-04"),
      (4L, "2024-01-03"), (4L, "2024-01-09"),
      (5L, "2024-01-01"), (5L, "2024-01-10"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val out = Retention.kaplanMeier(ev, "user_id", "ts", censorDays = 2)
      .orderBy("t_day").collect()
    // t=0: risk 5, d=1 -> S = 4/5
    // t=2: risk 4, d=2 -> S = 0.8 * 0.5 = 0.4
    // t=6: risk 2, d=0 (censored) -> S stays 0.4
    // t=9: risk 1, d=0 (censored) -> S stays 0.4
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((0, 5L, 1L, 0L), (2, 4L, 2L, 0L), (6, 2L, 0L, 1L),
        (9, 1L, 0L, 1L)))
    val surv = out.map(_.getDouble(4))
    assert(surv(0) == 0.8)
    assert(math.abs(surv(1) - 0.4) < 1e-15)
    assert(surv(2) == surv(1) && surv(3) == surv(1))
  }

  test("kaplanMeier: no censoring -> survival is the empirical tail share") {
    // censorDays = 0 still censors users whose last event IS the stream
    // end day (ld > end - 0 is false only when ld < end)... ld == end is
    // censored; pick lifetimes so the last day is unique to one user
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-01"), (3L, "2024-01-01"), (3L, "2024-01-03"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val out = Retention.kaplanMeier(ev, "user_id", "ts", censorDays = 0)
      .orderBy("t_day").collect()
    // u1 lifetime 1 dead, u2 lifetime 0 dead, u3 lifetime 2 censored (ld=end)
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((0, 3L, 1L, 0L), (1, 2L, 1L, 0L), (2, 1L, 0L, 1L)))
    val s = out.map(_.getDouble(4))
    assert(math.abs(s(0) - 2.0 / 3.0) < 1e-15)
    assert(math.abs(s(1) - 1.0 / 3.0) < 1e-15)
  }

  // ---- seasonal index ---------------------------------------------------

  test("seasonalIndex: integer weekday convention and exact index ratios") {
    // 2024-01-01 is a Monday -> dow 0; values 70 Monday, 10 the rest of
    // one full week: grand mean = (70 + 6*10)/7 days
    val rows = (0 until 7).map { i =>
      (f"2024-01-${i + 1}%02d", if (i == 0) 70.0 else 10.0) }
    val ev = rows.toDF("d", "value")
      .select(col("d").cast("timestamp").as("ts"), col("value"))
    val out = Timeseries.seasonalIndex(ev, "ts", "value")
      .orderBy("dow").collect()
    assert(out.length == 7)
    val mon = out.head
    assert(mon.getInt(0) == 0 && mon.getLong(1) == 1L)
    assert(mon.getDouble(2) == 70.0)
    val grand = (70.0 + 60.0) / 7.0
    assert(math.abs(mon.getDouble(4) - 70.0 / grand) < 1e-12)
    assert(math.abs(out(1).getDouble(4) - 10.0 / grand) < 1e-12)
  }

  // ---- autocorrelation --------------------------------------------------

  private def dayEvents(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((key, f"2024-01-${i + 1}%02d")) }

  test("autocorrelation: +1 on a linear ramp, negative on an alternator") {
    // ramp: cnt(day i) = i+1 -> lag-1 pairs are perfectly linear
    // alternator: 10,1,10,1,... -> lag-1 correlation is strongly negative
    // (the alternator case is the regression guard for the vanished
    // subtraction terms: without -SxSy the result comes out ~+1)
    val ev = (dayEvents("ramp", (1 to 10)) ++
      dayEvents("alt", Seq(10, 1, 10, 1, 10, 1, 10, 1)))
      .toDF("k", "d")
      .select(col("k"), col("d").cast("timestamp").as("ts"))
    val out = Timeseries.autocorrelation(ev, "k", "ts", lagDays = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(out("ramp") - 1.0) < 1e-12)
    assert(out("alt") < -0.9)
  }

  test("autocorrelation: constant series reports NULL, minPairs drops short keys") {
    val ev = (dayEvents("const", Seq.fill(6)(4)) ++
      dayEvents("short", Seq(1, 2, 3)))
      .toDF("k", "d")
      .select(col("k"), col("d").cast("timestamp").as("ts"))
    val out = Timeseries.autocorrelation(ev, "k", "ts", lagDays = 1,
      minPairs = 3)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSet == Set("const")) // short: 2 pairs
    assert(rows.head.isNullAt(3)) // zero variance -> NULL
  }

  // ---- CUSUM ------------------------------------------------------------

  test("cusum: closed form equals the textbook recursion, gaps count as zero") {
    // counts with a gap day (2024-01-03 absent -> zero) and a level jump
    val counts = Seq("2024-01-01" -> 5, "2024-01-02" -> 5,
      "2024-01-04" -> 9, "2024-01-05" -> 9, "2024-01-06" -> 9)
    val ev = counts.flatMap { case (d, c) => Seq.fill(c)(("k", d)) }
      .toDF("k", "d")
      .select(col("k"), col("d").cast("timestamp").as("ts"))
    val slack = 500000L
    val out = Timeseries.cusum(ev, "k", "ts", slackMicro = slack,
      hMicro = 3000000L).orderBy("day").collect()
    assert(out.length == 6) // full calendar span
    val M = 1000000L
    val target = 37L * M / 6L // total 37 over span 6 (floor div)
    // reference fold: the textbook recursion
    val series = Seq(5L, 5L, 0L, 9L, 9L, 9L)
    var sp = 0L; var sn = 0L
    val expected = series.map { c =>
      sp = math.max(0L, sp + (c * M - target - slack))
      sn = math.max(0L, sn + (target - c * M - slack))
      (c, sp, sn)
    }
    assert(out.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      == expected)
    // the gap day (zero events) must push the downward side
    assert(out(2).getLong(4) > 0L)
  }

  // ---- golden record ----------------------------------------------------

  test("goldenRecord: transitive clusters, singleton completion, survivorship rules") {
    val recs = Seq(
      (1L, "alpha corp", 10.0, 7L),
      (2L, "alpha corporation", 5.0, 9L),
      (3L, "alpha co", 20.0, 8L),   // linked to 2 only -> {1,2,3} transitive
      (4L, "delta", 1.0, 3L))       // singleton
      .toDF("ent_id", "name", "bal", "n")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("left_id", "right_id")
    val out = Linkage.goldenRecord(recs, "ent_id", pairs, "left_id",
      "right_id", longestOf = Seq("name"), maxOf = Seq("bal"),
      minOf = Seq("n"))
      .orderBy("cluster_id").collect()
    assert(out.length == 2)
    val c1 = out.head
    assert(c1.getLong(0) == 1L && c1.getLong(1) == 3L)
    assert(c1.getString(2) == "alpha corporation") // longest
    assert(c1.getDouble(3) == 20.0 && c1.getLong(4) == 7L)
    val c4 = out(1)
    assert(c4.getLong(0) == 4L && c4.getLong(1) == 1L)
    assert(c4.getString(2) == "delta")
  }

  test("goldenRecord: longest-string tie breaks to lexicographically greatest, NULLs lose") {
    val recs = Seq((1L, "bbb"), (2L, "aaa"), (3L, null))
      .toDF("ent_id", "name")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("l", "r")
    val out = Linkage.goldenRecord(recs, "ent_id", pairs, "l", "r",
      longestOf = Seq("name")).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L && out.head.getString(2) == "bbb")
  }

  // ---- segment overlap --------------------------------------------------

  test("segmentOverlap: exact counts, jaccard, containment, lift") {
    val m = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
      (1, "a")) // duplicate membership rows dedup
      .toDF("e", "s")
    val out = Profile.segmentOverlap(m, "e", "s").collect()
      .map(r => ((r.getString(0), r.getString(1)), r)).toMap
    assert(out.keySet == Set(("a", "b"))) // c shares no entity
    val r = out(("a", "b"))
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L) // n_a, n_b
    assert(r.getLong(4) == 2L && r.getLong(5) == 4L) // n_both, universe
    assert(math.abs(r.getDouble(6) - 2.0 / 3.0) < 1e-15) // jaccard
    assert(math.abs(r.getDouble(7) - 2.0 / 3.0) < 1e-15) // containment_a
    assert(r.getDouble(8) == 1.0)                        // containment_b
    assert(math.abs(r.getDouble(9) - 8.0 / 6.0) < 1e-15) // lift
  }

  // ---- k-hop BFS --------------------------------------------------------

  test("kHopDistances: min hops on a path, isolated seeds at hop 0, cutoff") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val seeds = Seq(1L, 99L).toDF("seed") // 99 touches no edge
    val out = Graph.kHopDistances(edges, "s", "d", seeds, "seed",
      maxHops = 2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 99L -> 0))
  }

  test("kHopDistances: two seeds take the shorter side, cycles terminate") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("seed")
    val out = Graph.kHopDistances(edges, "s", "d", seeds, "seed",
      maxHops = 5).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  // ---- label propagation ------------------------------------------------

  test("labelPropagation: deterministic min-tie argmax, two rounds on a triangle") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    // round 1: node1 sees {2,3} tie -> 2; node2 sees {1,3} -> 1; node3 -> 1
    val r1 = Graph.labelPropagation(edges, "s", "d", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    // round 2: node1 sees {1,1} -> 1; node2 sees {2,1} tie -> 1; node3 same
    val r2 = Graph.labelPropagation(edges, "s", "d", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: two components never share labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d")
    val out = Graph.labelPropagation(edges, "s", "d", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.filter(_._1 < 10L).values.forall(_ < 10L))
    assert(out.filter(_._1 >= 10L).values.forall(_ >= 10L))
  }

  // ---- link prediction --------------------------------------------------

  test("linkPrediction: wedge candidates only, existing edges excluded") {
    // square 1-2-3-4-1: non-adjacent diagonals (1,3) and (2,4) share two
    // common neighbors each; every adjacent pair is excluded
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("s", "d")
    val out = Graph.linkPrediction(edges, "s", "d").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getLong(6)))).toMap
    assert(out.keySet == Set((1L, 3L), (2L, 4L)))
    val d = out((1L, 3L))
    assert(d == ((2L, 2L, 2L, 1.0, 4L))) // common 2, degs 2/2, jaccard 1, pa 4
  }

  test("linkPrediction: minCommon filters weak candidates") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d") // path: (1,3) share 1
    assert(Graph.linkPrediction(edges, "s", "d", minCommon = 2).isEmpty)
    val one = Graph.linkPrediction(edges, "s", "d", minCommon = 1).collect()
    assert(one.length == 1 && one.head.getLong(2) == 1L)
  }

  // ---- phrase search ----------------------------------------------------

  test("phraseSearch: consecutive positions, multiple hits, 1-based") {
    val docs = Seq(
      (1L, "the quick brown fox the quick brown cat"),
      (2L, "quick the brown"),   // right words, wrong order
      (3L, "the quick"),         // prefix only at the end is still a miss
      (4L, "x the quick brown")) // match not at position 1
      .toDF("doc_id", "text")
    val out = graft.llmdata.TextAnalysis.phraseSearch(docs, "doc_id",
      "text", Seq("the", "quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (1L, 5L), (4L, 2L)))
  }

  test("phraseSearch: repeated-term phrases and overlapping matches") {
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val out = graft.llmdata.TextAnalysis.phraseSearch(docs, "doc_id",
      "text", Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (1L, 3L))) // overlapping starts both count
  }

  test("phraseSearch: single-token phrase degrades to a postings filter") {
    val docs = Seq((1L, "x y x"), (2L, "z")).toDF("doc_id", "text")
    val out = graft.llmdata.TextAnalysis.phraseSearch(docs, "doc_id",
      "text", Seq("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (1L, 3L)))
  }
}
