package graft

import org.apache.spark.sql.functions._

/** Round-7 curation/feature-engineering operators. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- featureHash ------------------------------------------------------

  test("featureHash: deterministic sparse vectors; repeated token doubles weight") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "alpha beta alpha")).toDF("id", "text")
    val out = graft.llmdata.TextAnalysis.featureHash(df, "id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.keys.forall { case (_, b) => b >= 0 && b < 64 })
    // identical docs -> identical vectors
    val v1 = out.collect { case ((1L, b), w) => b -> w }.toMap
    val v2 = out.collect { case ((2L, b), w) => b -> w }.toMap
    assert(v1 == v2 && v1.nonEmpty)
    // alpha appears twice: its bucket's |weight| is 2 (same sign twice)
    assert(v1.values.map(math.abs).toSet == Set(1L, 2L))
  }

  test("featureHash drops fully-cancelled buckets and empty docs") {
    val out = graft.llmdata.TextAnalysis.featureHash(
      Seq((1L, "   ")).toDF("id", "text"), "id", "text", 16)
    assert(out.count() == 0)
  }

  // ---- targetEncodeOOF --------------------------------------------------

  test("targetEncodeOOF: constant target encodes to the constant; fold counts conserve") {
    val df = (1L to 40L).map(i => (i, "c", 7.5)).toDF("id", "cat", "y")
    val out = graft.operators.Encode.targetEncodeOOF(df, "cat", "y", "id", 4)
      .collect()
    assert(out.map(_.getLong(2)).sum == 40L) // n_in_fold conserves rows
    out.foreach { r =>
      assert(r.getLong(3) == 40L - r.getLong(2)) // n_oof identity
      assert(r.getDouble(4) == 7.5)              // constant target
      assert(!r.getBoolean(5))
    }
  }

  test("targetEncodeOOF: single-row category takes the global prior, flagged") {
    val df = ((1L to 20L).map(i => (i, "big", 10.0)) :+ ((99L, "solo", 0.0)))
      .toDF("id", "cat", "y")
    val out = graft.operators.Encode.targetEncodeOOF(df, "cat", "y", "id", 4)
      .collect().map(r => (r.getString(0), r.getBoolean(5), r.getDouble(4)))
    val solo = out.filter(_._1 == "solo")
    assert(solo.length == 1 && solo.head._2, "solo category must be prior-flagged")
    assert(solo.head._3 == 200.0 / 21.0) // global mean
    // big category's OOF means exclude the solo row entirely
    out.filter(_._1 == "big").foreach { case (_, p, m) => assert(!p && m == 10.0) }
  }

  test("targetEncodeOOF: OOF mean really excludes the in-fold slice") {
    // replicate the md5 fold draw host-side and check each fold's
    // encoding equals the exact mean of the OTHER fold's targets
    def fold(id: Long, n: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % n).toInt
    }
    val ids = (1L to 30L)
    val byFold = ids.groupBy(fold(_, 2)).map { case (f, is) =>
      f -> (is.size.toLong, is.map(_.toDouble).sum)
    }
    assert(byFold.size == 2, "fixture must span both folds")
    val df = ids.map(i => (i, "c", i.toDouble)).toDF("id", "cat", "y")
    val enc = graft.operators.Encode.targetEncodeOOF(df, "cat", "y", "id", 2)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(enc.size == 2)
    enc.foreach { case (f, (nIn, mean)) =>
      val (otherN, otherSum) = byFold(1 - f)
      assert(nIn == byFold(f)._1)
      assert(mean == otherSum / otherN.toDouble,
        s"fold $f mean_oof must be the other fold's exact mean")
    }
  }

  // ---- boilerplateProfile -----------------------------------------------

  test("boilerplateProfile: shared shingles counted, fraction exact, short docs NULL") {
    val df = Seq(
      (1L, "the quick brown fox"),   // shingles: "the quick brown", "quick brown fox"
      (2L, "the quick brown cat"),
      (3L, "the quick brown dog"),
      (4L, "totally different words here"),
      (5L, "tiny doc"))              // too short for 3-grams
      .toDF("id", "text")
    val out = graft.llmdata.TextAnalysis
      .boilerplateProfile(df, "id", "text", shingleSize = 3, dfAtLeast = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // "the quick brown" appears in docs 1-3 (df = 3 >= 3); each doc's
    // second shingle is unique
    assert(out(1L) == ((2L, 1L, Some(0.5))))
    assert(out(2L) == ((2L, 1L, Some(0.5))))
    assert(out(3L) == ((2L, 1L, Some(0.5))))
    assert(out(4L) == ((2L, 0L, Some(0.0))))
    assert(out(5L) == ((0L, 0L, None)))
  }

  // ---- crossCorrelation -------------------------------------------------

  test("crossCorrelation: recovers the planted lead; pair counts shrink off-peak") {
    // series B is series A delayed by exactly 2 days (irregular counts,
    // so only the true lag is a perfect linear match)
    val counts = Seq(1, 3, 2, 5, 4, 7)
    def rows(key: String, startDay: Int) = counts.zipWithIndex.flatMap {
      case (c, i) => Seq.fill(c)(
        (key, java.sql.Timestamp.valueOf(f"2024-01-${startDay + i}%02d 12:00:00")))
    }
    val df = (rows("a", 1) ++ rows("b", 3)).toDF("k", "ts")
    val out = graft.operators.Timeseries
      .crossCorrelation(df, "k", "ts", "a", "b", maxLagDays = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (nPeak, rPeak) = out(2)
    assert(nPeak == 6L, "all six days pair at the true lag")
    assert(rPeak > 0.9999)
    out.filterNot(_._1 == 2).values.foreach { case (_, r) =>
      assert(r < rPeak, "the planted lag must be the unique peak")
    }
  }

  // ---- vocabularyGrowth -------------------------------------------------

  test("vocabularyGrowth: new terms land in their first bin; curve accumulates") {
    val df = Seq(
      (1L, "a b"), (2L, "a c"),   // bin 0: vocab {a,b,c}
      (3L, "b c"), (4L, "d d"),   // bin 1: +{d}
      (5L, "a b c d"), (6L, "e")) // bin 2: +{e}
      .toDF("doc_id", "text")
    val out = graft.llmdata.TextAnalysis
      .vocabularyGrowth(df, "doc_id", "text", nBins = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0) == ((2L, 4L, 3L, 3L)))
    assert(out(1) == ((2L, 4L, 1L, 4L)))
    assert(out(2) == ((2L, 5L, 1L, 5L)))
  }

  // ---- percentileNormalize ----------------------------------------------

  test("percentileNormalize: exact ECDF with ties-at-value and range edges") {
    val ref = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val tgt = Seq(0.0, 2.0, 5.0, 2.0).toDF("v")
    val out = graft.operators.Profile
      .percentileNormalize(tgt, ref, "v", lo = 0.0, width = 1.0, nBins = 3)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(0.0) == 0.0)   // below all reference mass
    assert(out(2.0) == 0.75)  // <= 2: three of four ref rows
    assert(out(5.0) == 1.0)   // above the clamp bin, full mass
    // empty reference -> NULL percentile, no blowup
    val empty = graft.operators.Profile.percentileNormalize(
      tgt, ref.filter(col("v") > 99), "v", 0.0, 1.0, 3)
    assert(empty.collect().forall(_.isNullAt(1)))
  }

  test("percentileNormalize: only bins-scale unpartitioned windows in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    val ref = Seq(1.0, 2.0).toDF("v")
    val plan = graft.operators.Profile
      .percentileNormalize(Seq(3.0).toDF("v"), ref, "v", 0.0, 1.0, 4)
      .queryExecution.optimizedPlan
    val bare = plan.collect { case w: LW if w.partitionSpec.isEmpty => w }
    assert(bare.nonEmpty, "expected the bin-offset window")
    bare.foreach { w =>
      assert(w.collectFirst { case a: Aggregate => a }.isDefined,
        s"unpartitioned window over a non-aggregated frame:\n$w")
    }
  }

  // ---- diffInDiff -------------------------------------------------------

  test("diffInDiff: treated change net of the control trend; empty cell -> NULL") {
    val df = Seq(
      (false, false, 1.0), (false, false, 3.0),  // control pre: mean 2
      (false, true, 4.0), (false, true, 6.0),    // control post: mean 5
      (true, false, 10.0),                       // treated pre: 10
      (true, true, 20.0))                        // treated post: 20
      .toDF("tr", "po", "v")
    val r = graft.operators.Robust.diffInDiff(df, "tr", "po", "v").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 2L, 1L, 1L)))
    assert(r.getDouble(8) == (20.0 - 10.0) - (5.0 - 2.0)) // DiD = 7
    val missing = graft.operators.Robust.diffInDiff(
      df.filter(!(col("tr") && !col("po"))), "tr", "po", "v").head()
    assert(missing.isNullAt(8), "empty treated-pre cell must NULL the estimate")
  }

  // ---- sampleRatioMismatch ----------------------------------------------

  test("sampleRatioMismatch: exact chi-square terms; off-design and unobserved variants") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(5)("c"))
      .toDF("variant")
    val out = graft.operators.Robust.sampleRatioMismatch(df, "variant",
      Seq("a" -> 1L, "b" -> 1L, "d" -> 2L))
      .collect().map(r => r.getString(0) -> r).toMap
    // W = 4, total = 45
    assert(out("a").getLong(4) == 5625L) // (120-45)^2
    assert(out("a").getDouble(6) == 5625.0 / 180.0)
    assert(out("d").getLong(1) == 0L)                        // designed, unseen
    assert(out("d").getLong(4) == 8100L) // (0-90)^2
    assert(out("d").getDouble(6) == 8100.0 / 360.0)
    assert(out("c").isNullAt(2) && out("c").isNullAt(6),
      "observed-but-undesigned variant must surface with NULL design columns")
  }

  // ---- topPaths ---------------------------------------------------------

  test("topPaths: ordered first-k steps per session, gap splits, shares sum to 1") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1L),
      (1L, ts("2024-01-01 10:05:00"), "click", 2L),
      (1L, ts("2024-01-01 10:06:00"), "purchase", 3L),
      (1L, ts("2024-01-01 10:07:00"), "error", 4L), // 4th step: truncated away
      (1L, ts("2024-01-01 12:00:00"), "view", 5L),  // new session (gap > 30 min)
      (1L, ts("2024-01-01 12:10:00"), "view", 6L),
      (2L, ts("2024-01-01 09:00:00"), "signup", 7L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = graft.operators.Sessionize
      .topPaths(df, "user_id", "ts", "event_type", 1800, "event_id", depth = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(
      "view>click>purchase" -> ((1L, 1.0 / 3.0)),
      "view>view" -> ((1L, 1.0 / 3.0)),
      "signup" -> ((1L, 1.0 / 3.0))))
  }

  // ---- Layout -----------------------------------------------------------

  test("compactionPlan: next-fit groups, overshoot bounded by one file") {
    val files = Seq(("a", 30L), ("b", 30L), ("c", 50L), ("d", 10L))
      .toDF("path", "bytes")
    val out = graft.operators.Layout.compactionPlan(files, "path", "bytes", 50L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((0L, 60L, 2L))) // a+b cross the first boundary
    assert(out("b") == ((0L, 60L, 2L)))
    assert(out("c") == ((1L, 50L, 1L)))
    assert(out("d") == ((2L, 10L, 1L)))
  }

  test("mortonCode: known interleave; out-of-range and NULL inputs go NULL") {
    val df = Seq((3L, 5L), (0L, 0L), (7L, 7L), (8L, 0L))
      .toDF("x", "y")
      .withColumn("z", graft.operators.Layout.mortonCode(col("x"), col("y"), 3))
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out((3L, 5L)) == Some(39L)) // z-bits y2x2y1x1y0x0 = 100111
    assert(out((0L, 0L)) == Some(0L))
    assert(out((7L, 7L)) == Some(63L))
    assert(out((8L, 0L)) == None, "x = 2^bits is out of range")
    // z-order locality: sorting by z keeps both coordinates monotone
    // within each quadrant — spot-check the quadrant split at bit 2
    val z = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)).toDF("x", "y")
      .withColumn("z", graft.operators.Layout.mortonCode(col("x"), col("y"), 3))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z.filter { case ((x, y), _) => x < 4 && y < 4 }.values.forall(_ < 16))
    assert(z.filter { case ((x, y), _) => x >= 4 && y >= 4 }.values.forall(_ >= 48))
  }

  // ---- skyline2d --------------------------------------------------------

  test("skyline2d: Pareto front with duplicates kept and extremes surviving") {
    val df = Seq((1L, 10L, "p1"), (2L, 9L, "p2"), (3L, 1L, "p3"),
      (2L, 5L, "p4"), (1L, 10L, "p5"), (0L, 11L, "p6"))
      .toDF("x", "y", "id")
    val out = graft.operators.Profile
      .skyline2d(df, "x", "y", lo = 0.0, width = 1.0, nBins = 2)
      .collect().map(_.getString(2)).sorted
    // front: (0,11), both copies of (1,10), (2,9), and (3,1) — the max-x
    // point always survives; (2,5) is dominated by (2,9)
    assert(out.toSeq == Seq("p1", "p2", "p3", "p5", "p6"))
  }

  // ---- prCurve ----------------------------------------------------------

  test("prCurve: hand curve with ties; recall reaches 1 at the lowest threshold") {
    val df = Seq((0.9, true), (0.8, false), (0.8, true), (0.1, false))
      .toDF("s", "pos")
    val out = graft.operators.Eval.prCurve(df, "s", col("pos"))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0.9) == ((1L, 1L, 1.0, 0.5)))
    assert(out(0.8) == ((3L, 2L, 2.0 / 3.0, 1.0))) // the tie group moves together
    assert(out(0.1) == ((4L, 2L, 0.5, 1.0)))
  }

  // ---- rankingReport ----------------------------------------------------

  test("rankingReport: best relevant rank drives fixed-point MRR; misses count 0") {
    val ranked = Seq(
      (1L, 1, false), (1L, 2, true), (1L, 3, true), // best = 2 -> 500000
      (2L, 1, true), (2L, 2, false),                // best = 1 -> 1000000
      (3L, 1, false), (3L, 2, false), (3L, 3, false)) // miss -> 0
      .toDF("q", "rank", "rel")
    val r = graft.operators.Eval.rankingReport(ranked, "q", "rank", col("rel"))
      .head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1500000L)
    assert(r.getDouble(3) == 2.0 / 3.0)
    assert(r.getDouble(4) == 500000.0)
  }

  // ---- cohenKappa -------------------------------------------------------

  test("cohenKappa: hand-computed table; perfect/degenerate edges") {
    // classic 2x2: a=20, d=15 agree; b=5, c=10 disagree; N=50
    // rows: (25, 25); cols: (30, 20); pe_num = 25*30 + 25*20 = 1250
    // kappa = (50*35 - 1250) / (2500 - 1250) = 500/1250 = 0.4
    val df = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))).toDF("a", "b")
    val r = graft.operators.Eval.cohenKappa(df, "a", "b").head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 35L)
    assert(r.getLong(2) == 1250L)
    assert(r.getDouble(3) == 0.4)
    // perfect agreement -> 1; single-label degenerate -> NULL
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(graft.operators.Eval.cohenKappa(perfect, "a", "b")
      .head().getDouble(3) == 1.0)
    val degen = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(graft.operators.Eval.cohenKappa(degen, "a", "b").head().isNullAt(3))
  }

  // ---- canonicalizeCategories -------------------------------------------

  test("canonicalizeCategories: typos collapse to the frequent parent, ties break low") {
    val df = (Seq.fill(10)("RETAIL") ++ Seq("RETAIl", "RETAI") ++
      Seq.fill(5)("AUTO") ++ Seq("AUTOX") ++ Seq.fill(3)("FOOD"))
      .toDF("cat")
    val out = graft.operators.Linkage.canonicalizeCategories(df, "cat")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out("RETAIl") == (("RETAIL", 10L)))
    assert(out("RETAI") == (("RETAIL", 10L)))
    assert(out("AUTOX") == (("AUTO", 5L)))
    assert(out("RETAIL") == (("RETAIL", 10L)), "the canonical maps to itself")
    assert(out("FOOD") == (("FOOD", 3L)), "isolated values stay put")
    // a value tied between two equal-count parents picks the smaller
    val tie = (Seq.fill(3)("AA") ++ Seq.fill(3)("AC") ++ Seq("AB")).toDF("cat")
    val t = graft.operators.Linkage.canonicalizeCategories(tie, "cat")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(t("AB") == "AA")
  }

  // ---- Metrics ----------------------------------------------------------

  test("Metrics.fromJson: fused grouped metrics with per-metric FILTER scopes") {
    val df = Seq(("a", 1.0, true), ("a", 2.0, false), ("b", 3.0, true))
      .toDF("g", "v", "flag")
    val out = graft.operators.Metrics.fromJson(spark, df,
      """[{"name":"n","agg":"COUNT(*)","cast":"BIGINT"},
        |{"name":"flagged","agg":"COUNT(*)","where":"flag","cast":"BIGINT"},
        |{"name":"v_sum","agg":"SUM(CAST(v AS DECIMAL(20,6)))","cast":"DECIMAL(38,6)"}]""".stripMargin,
      groupBy = Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3).doubleValue)).toMap
    assert(out("a") == ((2L, 1L, 3.0)))
    assert(out("b") == ((1L, 1L, 3.0)))
    // global (ungrouped) form and loud failures
    val g = graft.operators.Metrics.fromJson(spark, df,
      """[{"name":"n","agg":"COUNT(*)","cast":"BIGINT"}]""").head()
    assert(g.getLong(0) == 3L)
    intercept[IllegalArgumentException] {
      graft.operators.Metrics.fromJson(spark, df,
        """[{"name":"x","agg":"COUNT(*)"},{"name":"x","agg":"COUNT(*)"}]""")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Metrics.fromJson(spark, df, """[{"name":"x"}]""")
    }
  }

  // ---- seasonalNaiveBacktest --------------------------------------------

  test("seasonalNaiveBacktest: zero-filled spine, exact errors, WAPE/MAE") {
    // day i carries i events except day 5 (silent -> counts as 0)
    val counts = Map(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 6 -> 6, 7 -> 7)
    val df = counts.toSeq.flatMap { case (d, c) =>
      (1 to c).map(i => ("k",
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 0${i % 8}:00:00")))
    }.toDF("k", "ts")
    val r = graft.operators.Timeseries
      .seasonalNaiveBacktest(df, "k", "ts", periodDays = 3).head()
    // eval days 4..7 vs days 1..4: |4-1| + |0-2| + |6-3| + |7-4| = 11
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 11L)
    assert(r.getLong(3) == 17L) // 4 + 0 + 6 + 7
    assert(r.getDouble(4) == 11.0 / 17.0)
    assert(r.getDouble(5) == 11.0 / 4.0)
  }

  // ---- PlanAudit --------------------------------------------------------

  test("PlanAudit flags raw-row global windows and unbounded cross joins only") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.PlanAudit
    val df = (1L to 50L).map(i => (i, i % 5, i * 2.0)).toDF("id", "k", "v")
    // bad: global window straight over the fact rows
    val bad = df.withColumn("rk", row_number().over(Window.orderBy(col("v"))))
    assert(PlanAudit.audit(bad).exists(_.kind == "global-window-over-raw-rows"))
    intercept[IllegalArgumentException] { PlanAudit.assertScaleSafe(bad) }
    // fine: the same window over an AGGREGATED (metadata-scale) frame
    val agg = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
      .withColumn("rk", row_number().over(Window.orderBy(col("s"))))
    assert(PlanAudit.audit(agg).isEmpty)
    // bad: genuine cartesian product
    val cross = df.crossJoin(df.select(col("k").as("k2")))
    assert(PlanAudit.audit(cross).exists(_.kind == "unbounded-cross-join"))
    // fine: the blessed one-row-totals broadcast cross
    val totals = df.crossJoin(broadcast(df.agg(sum(col("v")).as("tot"))))
    assert(PlanAudit.audit(totals).isEmpty)
    // partitioned windows never flag
    val okWin = df.withColumn("rk",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"))))
    assert(PlanAudit.audit(okWin).isEmpty)
  }

  // ---- shortestPaths ----------------------------------------------------

  test("shortestPaths: cheap detour beats a heavy direct edge; unreached absent") {
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 1L), (1L, 3L, 15L),
      (8L, 9L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("s")
    val out = graft.operators.Graph
      .shortestPaths(edges, "src", "dst", "w", seeds, "s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 10L, 3L -> 11L),
      s"detour 1-2-3 (11) must beat direct 1-3 (15); got $out")
  }

  test("shortestPaths: round cap signals LOUDLY; capped dists are upper bounds") {
    val edges = (1L until 6L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    val captured =
      try {
        System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
        val out = graft.operators.Graph.shortestPaths(edges, "src", "dst",
          "w", Seq(1L).toDF("s"), "s", maxRounds = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L),
          "2 rounds reach exactly 2 hops")
        new String(buf.toByteArray, "UTF-8")
      } finally System.setErr(old)
    assert(captured.contains("WITHOUT converging"), s"got: $captured")
  }

  // ---- burstFirst -------------------------------------------------------

  test("burstFirst: retry storms collapse to their opener; later events survive") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, "click", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:00:03"), 2L), // burst dup
      (1L, "click", ts("2024-01-01 10:00:05"), 3L), // chained dup
      (1L, "click", ts("2024-01-01 10:30:00"), 4L), // new burst
      (1L, "view", ts("2024-01-01 10:00:01"), 5L),  // other key untouched
      (2L, "click", ts("2024-01-01 10:00:02"), 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val kept = graft.operators.Dedup
      .burstFirst(df, Seq("user_id", "event_type"), "ts", "event_id", 10L)
      .collect().map(_.getLong(3)).toSet
    assert(kept == Set(1L, 4L, 5L, 6L))
  }

  // ---- imagePatchGrid ---------------------------------------------------

  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("imagePatchGrid: exact tiling, row-major order, luma means per patch") {
    // left half black, right half white -> 2x2 grid means 0/255/0/255
    val a = pngBytes(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    val media = Seq((1L, a), (2L, "junk".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val out = graft.llmdata.Multimodal.imagePatchGrid(media, grid = 2)
      .collect().map(p => p.patch_index -> ((p.row, p.col, p.mean_luma))).toMap
    assert(out.size == 4, "undecodable payloads emit no rows")
    assert(out(0) == ((0, 0, 0.0)) && out(1) == ((0, 1, 255.0)))
    assert(out(2) == ((1, 0, 0.0)) && out(3) == ((1, 1, 255.0)))
  }

  // ---- Eval -------------------------------------------------------------

  test("aucByKey: perfect separation -> 1, reversed -> 0, all-tied -> 0.5") {
    def mk(rows: Seq[(Double, Boolean)]) =
      rows.map { case (s, p) => ("k", s, p) }.toDF("g", "s", "pos")
    def auc(rows: Seq[(Double, Boolean)]): Double =
      graft.operators.Eval.aucByKey(mk(rows), "g", "s", col("pos"))
        .head().getDouble(3)
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))) == 1.0)
    assert(auc(Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false))) == 0.0)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))) == 0.5)
    // one-class keys dropped
    assert(graft.operators.Eval.aucByKey(
      mk(Seq((0.5, true), (0.7, true))), "g", "s", col("pos")).count() == 0)
  }

  test("gainsTable: top bin captures the planted positives; tie group stays whole") {
    // 10 rows, scores 10..1, positives at the top 3 scores
    val df = (1 to 10).map(i => (i.toDouble, i >= 8)).toDF("s", "pos")
    val out = graft.operators.Eval.gainsTable(df, "s", col("pos"), nBins = 5)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5))).toMap
    assert(out(0) == ((2L, 2L, 2L, 2.0 / 3.0))) // scores 10,9
    assert(out(1) == ((2L, 1L, 3L, 1.0)))       // score 8 completes capture
    assert(out(4)._3 == 3L)
    // a tie group straddling a boundary lands whole in its first bin
    val tied = (Seq.fill(6)((5.0, false)) ++ Seq((1.0, true), (1.0, false)))
      .toDF("s", "pos")
    val bins = graft.operators.Eval.gainsTable(tied, "s", col("pos"), nBins = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bins == Map(0 -> 6L, 3 -> 2L), s"got $bins")
  }

  // ---- multiTouchPositional ---------------------------------------------

  test("multiTouchPositional: 40/20/20/40 exact micro-credits; n<=2 equal split") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1L),
      (1L, ts("2024-01-01 10:10:00"), "click", 2L),
      (1L, ts("2024-01-01 10:20:00"), "view", 3L),
      (1L, ts("2024-01-01 10:30:00"), "click", 4L),
      (1L, ts("2024-01-01 10:40:00"), "purchase", 5L),
      (2L, ts("2024-01-01 09:00:00"), "view", 6L),
      (2L, ts("2024-01-01 09:05:00"), "click", 7L),
      (2L, ts("2024-01-01 09:10:00"), "purchase", 8L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = graft.operators.Attribution.multiTouchPositional(df,
      "user_id", "ts", "event_type", "event_id",
      Seq("view", "click"), "purchase", 7200L)
      .collect().map(r => r.getAs[Long]("touch_id") ->
        r.getAs[Long]("credit_micro")).toMap
    // user 1, four touches: 40% / 10% / 10% / 40%
    assert(out(1L) == 400000L && out(2L) == 100000L
      && out(3L) == 100000L && out(4L) == 400000L)
    // user 2, two touches: equal split
    assert(out(6L) == 500000L && out(7L) == 500000L)
  }

  // ---- CheckConfig ------------------------------------------------------

  test("CheckConfig: JSON suite ≡ directly-built suite; references bind via tables map") {
    import graft.checks._
    val df = Seq((1L, "A", 10.0), (2L, "A", -3.0), (3L, "Z", 5.0))
      .toDF("id", "flag", "amount")
    val dim = Seq("A", "B").toDF("flag")
    val json =
      """[{"type":"not_null","column":"id"},
        |{"type":"in_set","column":"flag","values":["A","Z"]},
        |{"type":"unique","columns":["id"]},
        |{"type":"no_rows_where","label":"neg","predicate":"amount < 0"},
        |{"type":"references","column":"flag","parent":"dim","parent_column":"flag"},
        |{"type":"column_exists","column":"missing_col"}]""".stripMargin
    val fromCfg = CheckConfig.fromJson(spark, json, Map("dim" -> dim)).run(df)
    val direct = new CheckSuite(Seq(
      NotNull("id"), InSet("flag", Seq("A", "Z")), Unique(Seq("id")),
      NoRowsWhere("neg", col("amount") < 0),
      References("flag", dim, "flag"), ColumnExists("missing_col"))).run(df)
    assert(fromCfg == direct)
    val byName = fromCfg.map(r => r.constraint -> r.passed).toMap
    assert(byName("no_rows_where(neg)") == false)     // the -3.0 row
    assert(byName("references(flag)") == false)       // Z has no parent
    assert(byName("column_exists(missing_col)") == false)
    assert(byName("unique(id)") == true)
  }

  test("CheckConfig: unknown type and missing fields fail loudly") {
    import graft.checks._
    intercept[IllegalArgumentException] {
      CheckConfig.fromJson(spark, """[{"type":"wibble"}]""")
    }
    intercept[IllegalArgumentException] {
      CheckConfig.fromJson(spark, """[{"type":"not_null"}]""") // no column
    }
    intercept[IllegalArgumentException] {
      CheckConfig.fromJson(spark,
        """[{"type":"references","column":"a","parent":"nope","parent_column":"b"}]""")
    }
  }

  // ---- Bucketing --------------------------------------------------------

  test("bucketed tables join with ZERO shuffle exchanges (co-located join)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val left = (1L to 200L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 200L).map(i => (i, i * 2)).toDF("k", "rv")
    graft.sources.Bucketing.writeBucketed(left, "graft_bkt_l", "k", 4)
    graft.sources.Bucketing.writeBucketed(right, "graft_bkt_r", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path a fact-to-fact join takes at scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.sources.Bucketing.readBucketed(spark, "graft_bkt_l")
        .join(graft.sources.Bucketing.readBucketed(spark, "graft_bkt_r"),
          Seq("k"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed-bucketed join must not shuffle, found: $shuffles")
      assert(joined.count() == 200L)
      // and the result is right
      assert(joined.filter(col("k") === 7L).head().getLong(2) == 14L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }
}
