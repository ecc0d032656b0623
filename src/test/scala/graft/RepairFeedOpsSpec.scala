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
}
