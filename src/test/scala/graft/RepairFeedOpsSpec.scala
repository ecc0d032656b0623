package graft

import org.apache.spark.sql.functions._
import graft.operators.{Diff, Graph, Robust}

/** Round-6 third wave: deterministic imputation, incremental connected
  * components, snapshot-diff change feeds, RAKE keywords. */
class RepairFeedOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- impute -----------------------------------------------------------

  test("impute: per-group exact median + deterministic mode, provenance flags") {
    val df = Seq(
      ("g1", Some(1.0), Some("x")), ("g1", Some(3.0), Some("y")),
      ("g1", Some(9.0), Some("y")), ("g1", None, None),
      ("g2", Some(5.0), Some("z")), ("g2", None, Some("z")))
      .toDF("grp", "v", "c")
    val out = Robust.impute(df, "grp", medianCols = Seq("v"),
      modeCols = Seq("c")).orderBy("grp", "v", "c").collect()
    // g1 median of {1,3,9} = 3 (2*cum>=3 at v=3); mode {x:1, y:2} = y
    val g1Filled = out.filter(r => r.getString(0) == "g1" && !r.isNullAt(3))
    assert(g1Filled.length == 1)
    assert(g1Filled.head.getDouble(1) == 3.0 &&
      g1Filled.head.getString(2) == "y" &&
      g1Filled.head.getString(3) == "v,c")
    // g2 median of {5} = 5
    val g2Filled = out.filter(r => r.getString(0) == "g2" && !r.isNullAt(3))
    assert(g2Filled.head.getDouble(1) == 5.0 &&
      g2Filled.head.getString(3) == "v")
    // untouched rows carry NULL provenance
    assert(out.count(_.isNullAt(3)) == 4)
  }

  test("impute: even counts take the lower-middle value; mode ties take the smallest") {
    val df = Seq(("g", Some(1.0), Some("b")), ("g", Some(2.0), Some("a")),
      ("g", Some(3.0), None), ("g", Some(4.0), None), ("g", None, None))
      .toDF("grp", "v", "c")
    val out = Robust.impute(df, "grp", medianCols = Seq("v"),
      modeCols = Seq("c"))
      .filter(col("imputed_cols") === "v,c").collect()
    assert(out.length == 1)
    // median of {1,2,3,4}: 2*cum >= 4 first at v=2 (lower middle)
    assert(out.head.getDouble(1) == 2.0)
    // mode tie {a:1, b:1} -> smallest value "a"
    assert(out.head.getString(2) == "a")
  }

  test("impute: all-NULL groups stay NULL (no global fallback)") {
    val df = Seq(("g1", Some(7.0)), ("g2", None), ("g2", None))
      .toDF("grp", "v")
    val out = Robust.impute(df, "grp", medianCols = Seq("v"))
      .filter(col("grp") === "g2").collect()
    assert(out.forall(_.isNullAt(1)))
    assert(out.forall(_.isNullAt(2))) // imputed_cols NULL: nothing filled
  }

  // ---- incremental connected components ---------------------------------

  test("connectedComponentsIncremental ≡ batch on the union, merges relabel min-stable") {
    // batch 1: {1-2} {5-6}; batch 2 bridges them and adds {10-11}
    val e1 = Seq((1L, 2L), (5L, 6L)).toDF("s", "d")
    val e2 = Seq((2L, 5L), (10L, 11L)).toDF("s", "d")
    val base = Graph.connectedComponents(e1, "s", "d")
    val inc = Graph.connectedComponentsIncremental(base, e2, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Graph.connectedComponents(
      e1.unionByName(e2), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    assert(inc == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponentsIncremental: empty delta is an identity") {
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val base = Graph.connectedComponents(e1, "s", "d")
    val inc = Graph.connectedComponentsIncremental(base,
      Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---- CDC feed ---------------------------------------------------------

  private lazy val oldSnap = Seq(
    (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
    .toDF("k", "cat", "amt")
  private lazy val newSnap = Seq(
    (1L, "A", 10.0),   // unchanged
    (2L, "B2", 20.0),  // changed
    (4L, "D", 40.0))   // added; 3 removed
    .toDF("k", "cat", "amt")

  test("toCdcFeed: delete/insert encoding of added/removed/changed") {
    val feed = Diff.toCdcFeed(oldSnap, newSnap, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(feed == Set(
      ("delete", 2L, "B", 20.0), ("insert", 2L, "B2", 20.0),
      ("delete", 3L, "C", 30.0), ("insert", 4L, "D", 40.0)))
  }

  test("applyCdcFeed(old, toCdcFeed(old, new)) ≡ new — the round-trip identity") {
    val feed = Diff.toCdcFeed(oldSnap, newSnap, Seq("k"))
    val applied = Diff.applyCdcFeed(oldSnap, feed, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expect = newSnap
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(applied == expect)
  }

  test("toCdcFeed: identical snapshots produce an empty feed") {
    assert(Diff.toCdcFeed(oldSnap, oldSnap, Seq("k")).isEmpty)
  }

  // ---- RAKE -------------------------------------------------------------

  test("rakeKeywords: phrase split on stopwords, degree/freq micro scores") {
    // doc: "deep learning of deep models" with stopword "of":
    // phrases "deep learning" (len 2) and "deep models" (len 2)
    // deg(deep) = 4, freq = 2 -> 2.0; deg(learning) = 2, freq 1 -> 2.0;
    // deg(models) = 2 -> 2.0; both phrases score 4.0
    val docs = Seq((1L, "deep learning of deep models")).toDF("doc_id", "text")
    val out = graft.llmdata.TextAnalysis.rakeKeywords(docs, "doc_id",
      "text", stopwords = Seq("of"), topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(("deep learning", 2L, 1L, 4000000L),
      ("deep models", 2L, 1L, 4000000L)))
  }

  test("rakeKeywords: repeated phrases aggregate; longer phrases outrank words") {
    val docs = Seq(
      (1L, "spark streaming of spark streaming"),
      (2L, "spark")).toDF("doc_id", "text")
    // phrases: "spark streaming" x2, "spark" x1
    // deg(spark) = 2+2+1 = 5, freq 3 -> 1666666; deg(streaming) = 4, freq 2 -> 2000000
    val out = graft.llmdata.TextAnalysis.rakeKeywords(docs, "doc_id",
      "text", stopwords = Seq("of"), topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set(("spark streaming", 2L, 3666666L),
      ("spark", 1L, 1666666L)))
    // ordering: higher score first
    assert(out.head._1 == "spark streaming")
  }

  test("rakeKeywords: topK is a deterministic (score, phrase) cut") {
    val docs = Seq((1L, "aa of bb of cc")).toDF("doc_id", "text")
    val out = graft.llmdata.TextAnalysis.rakeKeywords(docs, "doc_id",
      "text", stopwords = Seq("of"), topK = 2)
      .collect().map(_.getString(0))
    // all score 1.0; tie -> lexicographic ascending
    assert(out.toSeq == Seq("aa", "bb"))
  }

  // ---- privacy ----------------------------------------------------------

  test("kAnonymityReport: achieved k/l, at-risk rows, suppression rate, verdicts") {
    // classes: (NY,M) x3 uniform sensitive; (NY,F) x1; (SF,M) x2 diverse
    val df = Seq(
      ("NY", "M", "flu"), ("NY", "M", "flu"), ("NY", "M", "flu"),
      ("NY", "F", "cold"),
      ("SF", "M", "flu"), ("SF", "M", "cold"))
      .toDF("city", "sex", "dx")
    val r = graft.checks.Privacy.kAnonymityReport(df, Seq("city", "sex"),
      Some("dx"), k = 2, l = 2).head()
    assert(r.getAs[Long]("n_classes") == 3L && r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("achieved_k") == 1L)       // the (NY,F) singleton
    assert(r.getAs[Long]("n_classes_below_k") == 1L)
    assert(r.getAs[Long]("n_rows_below_k") == 1L)
    assert(r.getAs[Long]("achieved_l") == 1L)       // (NY,M) and (NY,F) uniform
    assert(r.getAs[Long]("n_classes_below_l") == 2L)
    assert(r.getAs[Long]("n_rows_below_l") == 4L)
    assert(math.abs(r.getAs[Double]("suppression_rate") - 1.0 / 6.0) < 1e-15)
    assert(!r.getAs[Boolean]("k_anonymous") && !r.getAs[Boolean]("l_diverse"))
  }

  test("kAnonymityReport: passing dataset; no sensitive column -> NULL l columns") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4)).toDF("qi", "v")
    val r = graft.checks.Privacy.kAnonymityReport(df, Seq("qi"), None,
      k = 2, l = 2).head()
    assert(r.getAs[Long]("achieved_k") == 2L && r.getAs[Boolean]("k_anonymous"))
    assert(r.isNullAt(r.fieldIndex("achieved_l"))
      && r.isNullAt(r.fieldIndex("l_diverse")))
    assert(r.getAs[Double]("suppression_rate") == 0.0)
  }

  test("equivalenceClasses: NULL is a quasi-identifier value") {
    val df = Seq(Some("x"), None, None).map(v => Tuple1(v)).toDF("qi")
    val cls = graft.checks.Privacy.equivalenceClasses(df, Seq("qi"), None,
      k = 2, l = 1).collect()
    assert(cls.length == 2)
    val nullClass = cls.find(_.isNullAt(0)).get
    assert(nullClass.getAs[Long]("class_size") == 2L
      && !nullClass.getAs[Boolean]("at_risk_k"))
  }

  // ---- weighted PageRank ------------------------------------------------

  test("pageRank weighted: heavier edges carry more rank; weight-1 ≡ unweighted") {
    // star: 1 -> 2 (w 9), 1 -> 3 (w 1): node 2 must out-rank node 3
    val e = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(e, iterations = 2, weightCol = Some("w"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("2") > r("3"))
    // round 2 exact: node1 holds 150000; contribs (150000·9) div 10 and
    // (150000·1) div 10 -> 150000 + 85%·{135000, 15000}
    assert(r("2") == 264750L && r("3") == 162750L)
    val unw = Graph.pageRank(e.select("src", "dst"), iterations = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val w1 = Graph.pageRank(e.withColumn("w", lit(1L)), iterations = 2,
      weightCol = Some("w"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(unw == w1, "weight-1 weighted form must equal the unweighted path")
  }

  test("pageRank weighted: duplicate (src,dst) rows sum their weights") {
    val dup = Seq((1L, 2L, 4L), (1L, 2L, 5L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val merged = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val a = Graph.pageRank(dup, 2, weightCol = Some("w"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val b = Graph.pageRank(merged, 2, weightCol = Some("w"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(a == b)
  }

  test("pageRank personalized: mass concentrates near seeds; all-seeds ≡ classic") {
    // path 1 -> 2 -> 3 with seed {1}: node 1 restarts, 3 only receives
    // via 2 — decaying with distance; non-seeds get no restart mass
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("s")
    val r = Graph.pageRank(e, 2, teleportTo = Some(seeds))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // round 1: 1 -> 150000; 2 -> 0 + 85%*1000000 = 850000; 3 -> 0
    // round 2: 1 -> 150000; 2 -> 85%*150000 = 127500; 3 -> 85%*850000
    assert(r == Map("1" -> 150000L, "2" -> 127500L, "3" -> 722500L))
    val classic = Graph.pageRank(e, 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val allSeeds = Graph.pageRank(e, 2,
      teleportTo = Some(Seq(1L, 2L, 3L).toDF("s")))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(classic == allSeeds, "teleporting to every node ≡ classic PageRank")
  }

  test("pageRank: dangling mass returns to SEEDS under a teleport set") {
    // 1 -> 2, 2 is a sink; seed {1}. Round 1: dangling mass = node 2's
    // initial 0 (only seed 1 starts with mass)... run 2 rounds so node
    // 2 holds mass entering round 2, then check its dangling rank goes
    // back to seed 1 ONLY — node 2 (non-seed) must get no share
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("s")
    val r = Graph.pageRank(e, iterations = 2, redistributeDangling = true,
      teleportTo = Some(seeds))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // round 1: dangling = rank(2) = 0 -> 1: 150000, 2: 85%*1000000 = 850000
    // round 2: dangling = 850000; seeds get it all:
    //   1: 150000 + (85 * 850000) div 100 = 872500
    //   2: 0 + 85%*rank(1)=150000 -> 127500  (no dangling share)
    assert(r == Map("1" -> 872500L, "2" -> 127500L))
  }

  // ---- embedding drift --------------------------------------------------

  test("embeddingDrift: identical snapshots -> cosine 1, L2 0; shifted label detected") {
    val ref = Seq((1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(0.0f, 1.0f), "a"),
      (3L, Seq(1.0f, 1.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val same = graft.llmdata.Similarity
      .embeddingDrift(ref, ref, "embedding", "label")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(same("a").getDouble(3) - 1.0) < 1e-12)
    assert(same("a").getDouble(4) == 0.0)
    // cur: label a rotated 90° in aggregate -> centroid moves
    val cur = Seq((4L, Seq(-1.0f, 0.0f), "a"), (5L, Seq(0.0f, -1.0f), "a"),
      (6L, Seq(1.0f, 1.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val moved = graft.llmdata.Similarity
      .embeddingDrift(ref, cur, "embedding", "label")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(moved("a").getDouble(3) - (-1.0)) < 1e-12) // opposite
    assert(moved("a").getDouble(4) > 1.0)                      // centroids far
    assert(math.abs(moved("b").getDouble(3) - 1.0) < 1e-12)    // unmoved
  }

  test("embeddingDrift: one-sided labels report counts with NULL geometry") {
    val ref = Seq((1L, Seq(1.0f, 0.0f), "only_ref")).toDF("vec_id", "embedding", "label")
    val cur = Seq((2L, Seq(1.0f, 0.0f), "only_cur")).toDF("vec_id", "embedding", "label")
    val out = graft.llmdata.Similarity
      .embeddingDrift(ref, cur, "embedding", "label")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.isNullAt(3), r.isNullAt(4))).toMap
    assert(out("only_ref") == ((1L, 0L, true, true)))
    assert(out("only_cur") == ((0L, 1L, true, true)))
  }

  // ---- calibration ------------------------------------------------------

  test("calibration: exact bins, rates, and gaps; edge scores clamp deterministically") {
    val df = Seq(
      (0.05, true), (0.05, false),    // bin 0: rate 0.5, mean 0.05
      (0.10, false),                  // exactly on the 0.1 edge -> bin 1
      (0.95, true), (1.0, true))      // 1.0 clamps into bin 9
      .toDF("score", "label")
    val out = graft.operators.Profile.calibration(df, "score", "label", 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L, 9L))
    val b0 = out(0L)
    assert(b0.getAs[Long]("n") == 2L && b0.getAs[Long]("n_pos") == 1L)
    assert(b0.getAs[Double]("observed_rate") == 0.5)
    assert(math.abs(b0.getAs[Double]("mean_score") - 0.05) < 1e-12)
    assert(math.abs(b0.getAs[Double]("calibration_gap") - 0.45) < 1e-12)
    assert(out(1L).getAs[Long]("n") == 1L) // edge landed UP, exactly
    assert(out(9L).getAs[Long]("n") == 2L) // 0.95 and the clamped 1.0
    assert(out(9L).getAs[Double]("bin_lo") == 0.9)
  }

  // ---- itemsets ---------------------------------------------------------

  test("itemsets3: ordered triples, support threshold, duplicate items dedup") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "c"), // dup item in basket
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "d"),
      (3L, "a"), (3L, "b"), (3L, "d"))
      .toDF("basket", "item")
    val out = graft.operators.Patterns.itemsets3(df, "basket", "item", 2L)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
    // (a,b,c) in baskets 1,2; (a,b,d) in 2,3; all other triples once
    assert(out == Map(("a", "b", "c") -> 2L, ("a", "b", "d") -> 2L))
  }

  test("itemsets3: baskets below three distinct items contribute nothing") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "x")).toDF("basket", "item")
    assert(graft.operators.Patterns.itemsets3(df, "basket", "item", 1L).isEmpty)
  }

  // ---- set minhash ------------------------------------------------------

  test("minhashLshSets: identical sets pair at jaccard 1; duplicates dedup; disjoint never pair") {
    val m = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "c"), // dup membership row
      (3L, "x"), (3L, "y"), (3L, "z"))
      .toDF("set_id", "item")
    val out = graft.llmdata.DedupOps.minhashLshSets(m, "set_id", "item",
      bands = 4, rows = 2, jaccardThreshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == 1.0)
  }

  test("minhashLshSets: verified jaccard is the exact set jaccard") {
    // sets {a,b,c,d} vs {a,b,c,e}: jaccard 3/5 — identical first 3
    // minima make band collisions likely at rows=1
    val m = (Seq("a", "b", "c", "d").map((10L, _)) ++
      Seq("a", "b", "c", "e").map((20L, _))).toDF("set_id", "item")
    val out = graft.llmdata.DedupOps.minhashLshSets(m, "set_id", "item",
      bands = 8, rows = 1, jaccardThreshold = 0.5).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 0.6)
  }

  // ---- temporal split ---------------------------------------------------

  test("temporalSplit: per-entity floor quota, latest rows to test, tie rule") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")),
      (2L, 100L, ts("2024-01-02 00:00:00")),
      (3L, 100L, ts("2024-01-03 00:00:00")),
      (4L, 100L, ts("2024-01-04 00:00:00")),
      (5L, 100L, ts("2024-01-05 00:00:00")),
      // entity 200: 2 events at 20% -> floor(0.4) = 0 in test
      (6L, 200L, ts("2024-01-01 00:00:00")),
      (7L, 200L, ts("2024-01-02 00:00:00")),
      // entity 300: equal instants -> larger id counts as later
      (8L, 300L, ts("2024-01-01 00:00:00")),
      (9L, 300L, ts("2024-01-01 00:00:00")),
      (10L, 300L, ts("2024-01-01 00:00:00")),
      (11L, 300L, ts("2024-01-01 00:00:00")),
      (12L, 300L, ts("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = graft.llmdata.Sampling
      .temporalSplit(df, "user_id", "ts", "event_id", testPct = 20)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(5L) == "test") // latest of 5 for user 100
    assert((1L to 4L).forall(i => out(i) == "train"))
    assert(out(6L) == "train" && out(7L) == "train") // floor quota 0
    assert(out(12L) == "test") // largest id at the shared instant
    assert((8L to 11L).forall(i => out(i) == "train"))
  }

  test("theilSen: outlier days cannot drag the median slope") {
    // daily values 1, 2, 3 then an outlier 100: five of six pairwise
    // slopes are 1.0 or huge; the lower median stays 1.0
    val ev = Seq(("k", "2024-01-01", 1.0), ("k", "2024-01-02", 2.0),
      ("k", "2024-01-03", 3.0), ("k", "2024-01-04", 100.0))
      .toDF("k", "d", "value")
      .select(col("k"), col("d").cast("timestamp").as("ts"), col("value"))
    val out = graft.operators.Timeseries.theilSen(ev, "k", "ts", "value")
      .head()
    assert(out.getLong(1) == 6L)
    assert(out.getDouble(2) == 1.0)
  }

  test("negativeSample: k draws, never a positive, reproducible, margin exhaustion honest") {
    val pos = Seq((1L, 2L), (1L, 5L), (2L, 0L)).toDF("anchor", "item")
    val items = (0L until 10L).toDF("item")
    val a = graft.llmdata.Sampling.negativeSample(pos, "anchor", "item",
      items, k = 3, oversample = 8)
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.size == 6) // 3 per anchor
    assert(!rows.contains((1L, 2L)) && !rows.contains((1L, 5L))
      && !rows.contains((2L, 0L)))
    assert(rows.forall { case (_, i) => i >= 0 && i < 10 })
    // reproducible: a second evaluation is identical
    val b = graft.llmdata.Sampling.negativeSample(pos, "anchor", "item",
      items, k = 3, oversample = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == b)
    // a 3-item universe with 2 positives can yield at most 1 negative
    val tiny = graft.llmdata.Sampling.negativeSample(
      Seq((1L, 0L), (1L, 1L)).toDF("anchor", "item"),
      "anchor", "item", (0L until 3L).toDF("item"), k = 3, oversample = 20)
      .collect()
    assert(tiny.length == 1 && tiny.head.getLong(1) == 2L)
  }

  test("negativeSample: every unpartitioned window sits over an aggregated frame") {
    // the r6 scale flag: the item index used a global row_number over
    // the raw item catalog (single-partition at scale). The bucket
    // decomposition leaves exactly one class of unpartitioned window —
    // the 256-row bucket-offset table, whose child is an Aggregate —
    // and this pins that shape
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val pos = Seq((1L, 2L)).toDF("anchor", "item")
    val plan = graft.llmdata.Sampling.negativeSample(pos, "anchor", "item",
      (0L until 10L).toDF("item"), k = 2).queryExecution.optimizedPlan
    val bare = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bare.nonEmpty, "expected the bucket-offset window in the plan")
    bare.foreach { w =>
      assert(w.collectFirst { case a: Aggregate => a }.isDefined,
        s"unpartitioned window over a NON-aggregated (catalog-scale) frame:\n$w")
    }
  }

  test("prorate: floor shares + deterministic remainder sum back exactly") {
    val lines = Seq((1L, 1L, 3.0), (1L, 2L, 1.0)).toDF("k", "line", "w")
    val headers = Seq((1L, 10.000001)).toDF("k", "total")
    val out = graft.operators.Allocate
      .prorate(lines, headers, "k", "line", "w", "total")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // tm 10000001; floors 7500000 / 2500000; remainder 1 -> heavier line
    assert(out == Map(1L -> 7500001L, 2L -> 2500000L))
    assert(out.values.sum == 10000001L)
  }

  test("prorate: zero-weight groups split equally, remainder to the last line id") {
    val lines = Seq((1L, 1L, 0.0), (1L, 2L, 0.0)).toDF("k", "line", "w")
    val headers = Seq((1L, 5.000001)).toDF("k", "total")
    val out = graft.operators.Allocate
      .prorate(lines, headers, "k", "line", "w", "total")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 2500000L, 2L -> 2500001L))
  }

  test("prorate: the sum-back identity holds across many keys") {
    val lines = (1L to 50L).flatMap(k =>
      (1L to (k % 5 + 1)).map(l => (k, l, (k * l % 7).toDouble)))
      .toDF("k", "line", "w")
    val headers = (1L to 50L).map(k => (k, k * 13.37)).toDF("k", "total")
    val out = graft.operators.Allocate
      .prorate(lines, headers, "k", "line", "w", "total")
    val sums = out.groupBy("k")
      .agg(sum(col("allocated_micro")).as("s"))
      .join(headers.select(col("k"),
        (col("total").cast("decimal(20,6)") * 1000000).cast("long").as("tm")),
        Seq("k"))
      .filter(col("s") =!= col("tm"))
    assert(sums.isEmpty, "every key's shares must sum exactly to its total")
  }

  test("businessDaysBetween: weekday spans, weekends, antisymmetry") {
    def d(s: String) = s
    val df = Seq(
      ("2024-01-01", "2024-01-05"), // Mon -> Fri: 4
      ("2024-01-05", "2024-01-08"), // Fri -> Mon: 1
      ("2024-01-06", "2024-01-07"), // Sat -> Sun: 0
      ("2024-01-01", "2024-01-01"), // same day: 0
      ("2024-01-08", "2024-01-01"), // backwards: -5 (Mon back past a week)
      ("2024-01-01", "2024-01-15")) // two full weeks: 10
      .toDF("s", "e")
      .select(col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val out = df.select(graft.functions.ScalarFns
      .businessDaysBetween(col("s"), col("e")).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(4L, 1L, 0L, 0L, -5L, 10L))
  }

  test("pairEval: canonicalized dedup, exact metrics, empty-side NULLs") {
    val pred = Seq((1L, 2L), (3L, 4L), (2L, 1L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val r = graft.llmdata.DedupOps.pairEval(pred, truth).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5)
    val empty = graft.llmdata.DedupOps.pairEval(
      pred.filter(col("id_a") < 0), truth).head()
    assert(empty.isNullAt(3) && empty.getDouble(4) == 0.0)
  }

  test("piiColumnScan: email/phone/Luhn-card shares per column, flag threshold") {
    val df = Seq(
      ("a@b.com", "555-123-4567", "4111111111111111"), // valid Luhn card
      ("plain text", "BUILDING", "4111111111111112"),  // bad check digit
      ("x@y.org", null, "MACHINERY"))
      .toDF("contact", "phone", "card")
    val out = graft.checks.Privacy.piiColumnScan(df,
      Seq("contact", "phone", "card"), flagAt = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = out("contact")
    assert(c.getAs[Long]("n_values") == 3L && c.getAs[Long]("n_email") == 2L)
    assert(c.getAs[Boolean]("flagged")) // 2/3 >= 0.5
    val p = out("phone")
    assert(p.getAs[Long]("n_values") == 2L && p.getAs[Long]("n_phone") == 1L)
    assert(p.getAs[Double]("phone_share") == 0.5 && p.getAs[Boolean]("flagged"))
    val k = out("card")
    assert(k.getAs[Long]("n_card_luhn") == 1L, "only the valid-Luhn card counts")
    assert(!k.getAs[Boolean]("flagged")) // 1/3 < 0.5
  }

  test("kaplanMeierBy: independent per-segment curves, shared global horizon") {
    // segment A: users dying at t=0 and t=1; segment B: one censored user
    val ev = Seq(
      ("A", 1L, "2024-01-01"), ("A", 2L, "2024-01-01"), ("A", 2L, "2024-01-02"),
      ("B", 3L, "2024-01-01"), ("B", 3L, "2024-01-10"))
      .toDF("seg", "user_id", "d")
      .select(col("seg"), col("user_id"), col("d").cast("timestamp").as("ts"))
    val out = graft.operators.Retention
      .kaplanMeierBy(ev, "seg", "user_id", "ts", censorDays = 1)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    // A: t=0 risk 2 death 1 -> S 0.5; t=1 risk 1 death 1 -> S 0.0
    assert(out(("A", 0)).getDouble(5) == 0.5)
    assert(out(("A", 1)).getDouble(5) == 0.0)
    // B: user 3's last day IS the global stream end -> censored, S stays 1
    val b = out(("B", 9))
    assert(b.getLong(3) == 0L && b.getLong(4) == 1L && b.getDouble(5) == 1.0)
  }

  test("topKWithOthers: deterministic cut, tail mass preserved, Other rank k+1") {
    val df = Seq(("g", "a", 5.0), ("g", "b", 3.0), ("g", "c", 3.0),
      ("g", "d", 1.0), ("g", "e", 1.0), ("h", "x", 2.0))
      .toDF("grp", "item", "w")
    val out = graft.operators.Profile.topKWithOthers(df, "grp", "item", "w", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)) ->
        (r.getInt(3), r.getLong(4), r.getDouble(5))).toMap
    // g top-2: a (5), b (3 — tie with c breaks lexicographically)
    assert(out(("g", "a", false)) == ((1, 1L, 5.0)))
    assert(out(("g", "b", false)) == ((2, 1L, 3.0)))
    assert(out(("g", "__other__", true)) == ((3, 3L, 5.0))) // c + d + e
    assert(out(("h", "x", false)) == ((1, 1L, 2.0)))
    // mass conservation
    assert(out.collect { case (("g", _, _), (_, _, t)) => t }.sum == 13.0)
  }

  test("topKWithOthers: a genuine '__other__' item does not merge into the rollup") {
    val df = Seq(("g", "__other__", 9.0), ("g", "b", 3.0), ("g", "c", 2.0),
      ("g", "d", 1.0)).toDF("grp", "item", "w")
    val out = graft.operators.Profile.topKWithOthers(df, "grp", "item", "w", 2)
      .collect().map(r => (r.getString(1), r.getBoolean(2)) ->
        (r.getInt(3), r.getLong(4), r.getDouble(5))).toMap
    // the literal item wins rank 1 as a HEAD row; the rollup row is the
    // separate is_other=true bucket with c + d
    assert(out(("__other__", false)) == ((1, 1L, 9.0)))
    assert(out(("b", false)) == ((2, 1L, 3.0)))
    assert(out(("__other__", true)) == ((3, 2L, 3.0)))
  }

  test("shareOfParent: shares sum to 1 within parents and globally") {
    val df = Seq(("r1", "n1", 6.0), ("r1", "n2", 2.0), ("r2", "n3", 2.0))
      .toDF("r", "n", "w")
    val out = graft.operators.Profile.shareOfParent(df, "r", "n", "w")
      .collect().map(x => x.getString(1) ->
        (x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(out("n1") == ((6.0, 0.75, 0.6)))
    assert(out("n2") == ((2.0, 0.25, 0.2)))
    assert(out("n3") == ((2.0, 1.0, 0.2)))
  }

  // ---- minimum spanning forest ------------------------------------------

  /** Kruskal reference under the same (w, a, b) total order. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val canon = edges.map { case (s, d, w) =>
      (math.min(s, d), math.max(s, d), w) }
      .groupBy(e => (e._1, e._2)).map { case ((a, b), es) =>
        (a, b, es.map(_._3).min) }.toSeq
    canon.sortBy(e => (e._3, e._1, e._2)).flatMap { case (a, b, w) =>
      if (find(a) != find(b)) { parent(find(a)) = find(b); Some((a, b, w)) }
      else None
    }.toSet
  }

  test("minSpanningForest ≡ Kruskal under the shared total order (ties, parallels, forest)") {
    // two components, a tie at weight 3, and a parallel edge pair
    val raw = Seq(
      (1L, 2L, 4L), (2L, 3L, 3L), (1L, 3L, 3L), (3L, 4L, 9L), (1L, 4L, 8L),
      (2L, 1L, 7L), // parallel to (1,2,4) — min kept
      (10L, 11L, 1L), (11L, 12L, 2L), (10L, 12L, 5L))
    val got = Graph.minSpanningForest(raw.toDF("s", "d", "w"), "s", "d", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == kruskal(raw))
    // forest sizes: 3 edges for the 4-node component, 2 for the 3-node
    assert(got.size == 5)
  }

  test("minSpanningForest on a larger deterministic graph matches Kruskal") {
    val raw = (0 until 120).map { i =>
      val s = (i * 7919L) % 40
      val d = (i * 104729L + 13) % 40
      (s, d, (i * 31L) % 17 + 1)
    }.filter(e => e._1 != e._2)
    val got = Graph.minSpanningForest(raw.toDF("s", "d", "w"), "s", "d", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == kruskal(raw))
  }

  test("temporalSplit: testPct 0 and 100 are total") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq((1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-02 00:00:00"))).toDF("event_id", "user_id", "ts")
    assert(graft.llmdata.Sampling
      .temporalSplit(df, "user_id", "ts", "event_id", 0)
      .filter(col("split") === "test").isEmpty)
    assert(graft.llmdata.Sampling
      .temporalSplit(df, "user_id", "ts", "event_id", 100)
      .filter(col("split") === "train").isEmpty)
  }
}
