package graft

import org.apache.spark.sql.functions._

/** Round-8 guards and helpers: gini contract NULL-out, OOF null-id
  * loud failure, the score pre-quantizer, and the BIGINT output class
  * of the rank statistics (the r7 decimal-purge). */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- giniByKey contract enforcement -----------------------------------

  test("giniByKey NULLs out keys containing negative values, loudly per key") {
    val df = Seq(("ok", 10.0), ("ok", 30.0),
      ("bad", 10.0), ("bad", -5.0), ("bad", 20.0)).toDF("g", "v")
    val out = graft.operators.RankStats.giniByKey(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // clean key unaffected: exact micro total, real gini
    assert(out("ok").getLong(2) == 40000000L)
    assert(!out("ok").isNullAt(3))
    // violating key survives with total/gini NULL (n counts valid rows)
    assert(out("bad").isNullAt(2) && out("bad").isNullAt(3))
    assert(out("bad").getLong(1) == 2L)
  }

  test("giniByKey fails loudly on grid-overflow magnitudes (ANSI decimal cast)") {
    // 1e12 overflows the documented decimal(12,2) grid: under Spark's
    // default ANSI mode the cast THROWS — the loudest possible
    // contract violation, never a silent NULL group
    val df = Seq(("k", 1.0), ("k", 1.0e12)).toDF("g", "v")
    val ex = intercept[Exception] {
      graft.operators.RankStats.giniByKey(df, "g", "v").collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("Decimal(12, 2)")) ||
        mentions(t.getCause))
    assert(mentions(ex))
  }

  // ---- targetEncodeOOF null-id rejection --------------------------------

  test("targetEncodeOOF fails loudly on NULL row ids instead of a silent fold") {
    val bad = Seq((Some(1L), "a", 1.0), (None, "a", 2.0))
      .toDF("id", "cat", "y")
    val ex = intercept[Exception] {
      graft.operators.Encode.targetEncodeOOF(bad, "cat", "y", "id", 2).collect()
    }
    assert(ex.getMessage.contains("NULL id")
      || Option(ex.getCause).exists(_.getMessage.contains("NULL id")))
    // non-null ids still work
    val ok = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "cat", "y")
    assert(graft.operators.Encode
      .targetEncodeOOF(ok, "cat", "y", "id", 2).count() > 0)
  }

  // ---- quantizeScores ---------------------------------------------------

  test("quantizeScores collapses a continuous score to a bounded lattice " +
    "and prCurve runs values-scale over it") {
    // 200k distinct doubles in [0,1): raw prCurve lattice would be row
    // scale; quantized at 1e-3 it is <= 1001 thresholds
    val scores = spark.range(200000L)
      .select((col("id") % 3 === 0).as("pos"),
        (col("id").cast("double") / 200000.0).as("s"))
    assert(scores.select(col("s")).distinct().count() == 200000L)
    val q = graft.operators.Eval.quantizeScores(scores, "s", 0.001)
    val nLattice = q.select(col("s")).distinct().count()
    assert(nLattice <= 1001L, s"lattice not collapsed: $nLattice")
    val pr = graft.operators.Eval.prCurve(q, "s", col("pos"))
    assert(pr.count() == nLattice)
    // recall is monotone non-increasing in threshold (sanity of the
    // cumulated lattice)
    val rows = pr.orderBy(col("threshold").desc).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) <= b.getDouble(4) + 1e-15)
    }
    // grid chain: floor(s/g)*g exactly; NULL stays NULL
    val withNull = Seq(Some(0.12345), None).toDF("s")
    val qq = graft.operators.Eval.quantizeScores(withNull, "s", 0.001)
      .collect()
    assert(qq.exists(r => !r.isNullAt(0)
      && r.getDouble(0) == math.floor(0.12345 / 0.001) * 0.001))
    assert(qq.exists(_.isNullAt(0)))
  }

  // ---- BIGINT output class (decimal purge) ------------------------------

  test("rank statistics and kappa emit BIGINT (never decimal) compared columns") {
    import org.apache.spark.sql.types.LongType
    val df = Seq(("k", 1.0, "A"), ("k", 2.0, "B"), ("k", 3.0, "A"),
      ("k", 4.0, "B")).toDF("g", "v", "s")
    val ks = graft.operators.RankStats.ksTwoSample(df, "g", "v", col("s") === "A")
    assert(ks.schema("d_numerator").dataType == LongType)
    val mwu = graft.operators.RankStats.mannWhitneyU(df, "g", "v", col("s") === "A")
    assert(mwu.schema("u_a_doubled").dataType == LongType)
    assert(mwu.schema("u_b_doubled").dataType == LongType)
    val g = graft.operators.RankStats.giniByKey(df, "g", "v")
    assert(g.schema("total_micro").dataType == LongType)
    val kap = graft.operators.Eval.cohenKappa(
      Seq(("x", "x"), ("y", "x")).toDF("a", "b"), "a", "b")
    assert(kap.schema("chance_num").dataType == LongType)
    val srm = graft.operators.Robust.sampleRatioMismatch(
      Seq("a", "b").toDF("variant"), "variant", Seq("a" -> 1L, "b" -> 1L))
    assert(srm.schema("term_num").dataType == LongType)
    assert(srm.schema("term_den").dataType == LongType)
    val tv = graft.checks.Drift.totalVariation(
      Seq("x").toDF("c"), Seq("x", "y").toDF("c"), col("c"))
    assert(tv.schema("tv_numerator").dataType == LongType)
  }

  // ---- Kruskal-Wallis ---------------------------------------------------

  test("kruskalWallis: hand-computed doubled rank sums with a cross-group tie") {
    // A=[1,2], B=[2,3], C=[5]: doubled midranks 2,5,5,8,10
    val df = Seq(("k", "A", 1.0), ("k", "A", 2.0), ("k", "B", 2.0),
      ("k", "B", 3.0), ("k", "C", 5.0)).toDF("g", "grp", "v")
    val out = graft.operators.RankStats.kruskalWallis(df, "g", "grp", "v")
      .collect().map(r => r.getString(1) -> r).toMap
    assert(out("A").getLong(2) == 2L && out("A").getLong(3) == 7L)
    assert(out("B").getLong(2) == 2L && out("B").getLong(3) == 13L)
    assert(out("C").getLong(2) == 1L && out("C").getLong(3) == 10L)
    assert(out("A").getLong(4) == 5L)            // n
    assert(out("A").getLong(5) == 6L)            // one tie group of 2: 2^3-2
    // identity: sum of doubled rank sums = 2 * n(n+1)/2 = n(n+1)
    assert(out.values.map(_.getLong(3)).sum == 30L)
  }

  // ---- Kendall tau-b ----------------------------------------------------

  test("kendallTau: concordant/discordant with ties, tau_b hand value") {
    // cells: (1,1)x2, (2,3)x1, (3,2)x1 -> C=4, D=1, tx=ty=1, n0=6
    val df = Seq(("k", 1.0, 1.0), ("k", 1.0, 1.0), ("k", 2.0, 3.0),
      ("k", 3.0, 2.0)).toDF("g", "x", "y")
    val r = graft.operators.RankStats.kendallTau(df, "g", "x", "y").head()
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L)
    // sqrt(5)*sqrt(5) = 5.000000000000001 — the engine's chain exactly
    assert(r.getDouble(6) == 3.0 / (math.sqrt(5.0) * math.sqrt(5.0)))
    // fully tied x -> NULL tau_b
    val tied = Seq(("k", 1.0, 1.0), ("k", 1.0, 2.0)).toDF("g", "x", "y")
    assert(graft.operators.RankStats.kendallTau(tied, "g", "x", "y")
      .head().isNullAt(6))
  }

  // ---- Kaplan-Meier -----------------------------------------------------

  test("kaplanMeier: at-risk identity, censoring split, per-row hazard") {
    val units = Seq(("k", 1L, true), ("k", 1L, false), ("k", 2L, true),
      ("k", 3L, true), ("k", 3L, false)).toDF("g", "dur", "ev")
    val out = graft.operators.Survival.kaplanMeier(units, "g", "dur", "ev")
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(1L).getLong(2) == 5L && out(1L).getLong(3) == 1L
      && out(1L).getLong(4) == 1L && out(1L).getDouble(5) == 0.2)
    assert(out(2L).getLong(2) == 3L && out(2L).getDouble(5) == 1.0 / 3.0)
    assert(out(3L).getLong(2) == 2L && out(3L).getLong(4) == 1L
      && out(3L).getDouble(5) == 0.5)
  }

  // ---- Benjamini-Hochberg -----------------------------------------------

  test("benjaminiHochberg: step-up rescues earlier ranks; total-order enforced") {
    import graft.operators.Robust
    // p=[0.05,0.051,0.052] at alpha=0.1: rank-1 fails its own threshold
    // (0.0333) but k*=3 rejects ALL — the step-up property Bonferroni
    // lacks
    val tests = Seq(("t1", 0.05), ("t2", 0.051), ("t3", 0.052))
      .toDF("test_id", "p")
    val out = Robust.benjaminiHochberg(tests, "p", 0.1, Seq("test_id"))
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(out == Map("t1" -> true, "t2" -> true, "t3" -> true))
    // a clearly null p stays out; a large p is not rejected
    val mixed = Seq(("a", 0.001), ("b", 0.9)).toDF("test_id", "p")
    val m2 = Robust.benjaminiHochberg(mixed, "p", 0.1, Seq("test_id"))
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(m2("a") && !m2("b"))
    // duplicate (p, tiebreak) tuple -> loud in-plan failure
    val dup = Seq(("t", 0.5), ("t", 0.5)).toDF("test_id", "p")
    intercept[Exception] {
      Robust.benjaminiHochberg(dup, "p", 0.1, Seq("test_id")).collect()
    }
    // p outside [0,1] -> loud in-plan failure, never silently ranked
    val junk = Seq(("t1", 0.5), ("t2", 1.5)).toDF("test_id", "p")
    intercept[Exception] {
      Robust.benjaminiHochberg(junk, "p", 0.1, Seq("test_id")).collect()
    }
  }

  // ---- CUPED ------------------------------------------------------------

  test("cuped: hand-computed theta and adjusted effect") {
    // treated (1,3),(3,7); control (2,4),(4,8): theta=1.8,
    // raw=-1, xGap=-1, adjusted=0.8
    val units = Seq((true, 1L, 3L), (true, 3L, 7L),
      (false, 2L, 4L), (false, 4L, 8L)).toDF("tr", "x", "y")
    val r = graft.operators.Robust.cuped(units, "tr", "x", "y").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 4L && r.getLong(4) == 10L) // sum_x/y treat
    assert(r.getLong(5) == 6L && r.getLong(6) == 12L) // sum_x/y ctrl
    assert(r.getDouble(7) == 1.8)
    assert(r.getDouble(8) == -1.0)
    assert(math.abs(r.getDouble(9) - 0.8) < 1e-12)
    // degenerate var(x)=0 -> NULL scalars
    val flat = Seq((true, 1L, 3L), (false, 1L, 4L)).toDF("tr", "x", "y")
    val f = graft.operators.Robust.cuped(flat, "tr", "x", "y").head()
    assert(f.isNullAt(7) && f.isNullAt(9))
  }

  // ---- chi-square independence ------------------------------------------

  test("chiSquareIndependence: exact per-cell residuals on a 2x2 table") {
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val out = graft.operators.Robust
      .chiSquareIndependence(rows.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ax = out(("a", "x"))
    assert(ax.getLong(2) == 10L && ax.getLong(3) == 30L && ax.getLong(4) == 40L)
    assert(ax.getLong(6) == -200L)          // 100*10 - 30*40
    assert(ax.getLong(7) == 120000L)        // 100*30*40
    assert(ax.getDouble(8) == 40000.0 / 120000.0)
    // independence-consistent table: every residual 0
    val indep = Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(4)(("b", "y"))
    assert(graft.operators.Robust
      .chiSquareIndependence(indep.toDF("u", "v"), "u", "v")
      .collect().forall(r => r.getLong(6) == 0L && r.getDouble(8) == 0.0))
  }

  // ---- golden records ---------------------------------------------------

  test("goldenRecords: per-attribute mode survivorship, ties break smallest, " +
    "all-NULL attribute survives NULL") {
    val records = Seq(
      (1L, "Ann", "GOLD"), (2L, "Ann", null), (3L, "Amn", null), // cluster 10
      (4L, "Bob", null), (5L, "Bpb", null),                      // cluster 20
      (6L, "Cat", "SILVER"), (7L, "Dog", "BRONZE")               // cluster 30
    ).toDF("rec_id", "name", "seg")
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 30L), (7L, 30L)).toDF("rec_id", "cluster")
    val out = graft.operators.Linkage
      .goldenRecords(records, "rec_id", assign, "cluster", Seq("name", "seg"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getLong(1) == 3L)
    assert(out(10L).getString(2) == "Ann")          // 2-vs-1 mode
    assert(out(10L).getString(3) == "GOLD")         // single non-null vote
    assert(out(20L).getString(2) == "Bob")          // 1-1 tie -> smallest
    assert(out(20L).isNullAt(3))                    // all NULL -> NULL
    assert(out(30L).getString(2) == "Cat")          // tie -> smallest
    assert(out(30L).getString(3) == "BRONZE")       // tie -> smallest
  }

  // ---- column drift report ----------------------------------------------

  test("columnDriftReport: added/removed/type_changed/kept with exact null counts") {
    val ref = Seq((Some(1L), "a", Some(1.5)), (None, "b", None))
      .toDF("id", "tag", "v")
    val cur = Seq(("1", "a", "x"), ("2", null, "y"), ("3", "c", "z"))
      .toDF("id", "tag", "extra")
    val out = graft.operators.Diff.columnDriftReport(ref, cur)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("id").getString(1) == "type_changed")
    assert(out("tag").getString(1) == "kept")
    assert(out("v").getString(1) == "removed" && out("v").isNullAt(6))
    assert(out("extra").getString(1) == "added" && out("extra").isNullAt(4))
    assert(out("id").getLong(4) == 2L && out("id").getLong(5) == 1L)
    assert(out("tag").getLong(6) == 3L && out("tag").getLong(7) == 1L)
    assert(out("v").getLong(5) == 1L)
    assert(out("tag").getDouble(9) == 1.0 / 3.0)    // null_frac_cur
  }

  // ---- z-order layout ---------------------------------------------------

  test("zone-map reader over ZOrder.layout: single-dimension predicates " +
    "prune files a one-column sort cannot; candidates reproduce the exact " +
    "filter result") {
    import graft.operators.{Layout, ZOrder}
    // decorrelated (x, y) in [0, 1024)^2 via integer hashing
    val df = spark.range(40000L).select(
      ((col("id") * 2654435761L) % 1024).as("x"),
      ((col("id") * 40503L + 7) % 1024).as("y"))
    val zPath = "/tmp/graft-test-zorder"
    val lPath = "/tmp/graft-test-linear"
    ZOrder.layout(df, "x", "y", 10, 16).write.mode("overwrite").parquet(zPath)
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(lPath)
    val zStats = Layout.skippingStats(spark, zPath, Seq("x", "y"))
      .localCheckpoint(true)
    val lStats = Layout.skippingStats(spark, lPath, Seq("x", "y"))
    assert(zStats.count() == 16L && lStats.count() == 16L)
    // a y-only box: the x-sorted layout cannot skip ANY file (every
    // file spans full y); the z layout confines y's high bits per file
    val box = Seq(("y", 100L, 200L))
    val zCand = Layout.candidateFiles(zStats, box)
    val lCand = Layout.candidateFiles(lStats, box).count()
    assert(lCand == 16L, "one-column sort should be unable to skip on y")
    assert(zCand.count() <= 8L,
      s"z-order should prune at least half the files, kept ${zCand.count()}")
    // candidate files alone reproduce the exact filter result
    val paths = zCand.collect().map(_.getString(0)).toSeq
    val fromCandidates = spark.read.parquet(paths: _*)
      .filter(col("y").between(100, 200)).count()
    assert(fromCandidates == df.filter(col("y").between(100, 200)).count())
  }

  // ---- split conformal --------------------------------------------------

  test("conformalQuantile: exact rational rank, tie handling, k>n -> NULL") {
    import graft.operators.Eval
    // residuals 1..9: alpha=1/10 -> k=ceil(10*9/10)=9 -> qhat=9;
    // alpha=2/10 -> k=8 -> qhat=8
    val df = (1 to 9).map(i => ("k", i.toDouble)).toDF("g", "r")
    val a1 = Eval.conformalQuantile(df, "g", "r", 1, 10).head()
    assert(a1.getLong(1) == 9L && a1.getLong(2) == 9L
      && a1.getDouble(3) == 9.0)
    val a2 = Eval.conformalQuantile(df, "g", "r", 2, 10).head()
    assert(a2.getLong(2) == 8L && a2.getDouble(3) == 8.0)
    // alpha=1/20: k=ceil(10*19/20)=10 > n=9 -> NULL qhat (not clamped)
    assert(Eval.conformalQuantile(df, "g", "r", 1, 20).head().isNullAt(3))
    // ties: residuals [1,2,2,2,5], alpha=2/6 -> k=ceil(6*4/6)=4 ->
    // cum at v=2 is 4 -> qhat=2 (the tie group carries the rank)
    val tied = Seq(1.0, 2.0, 2.0, 2.0, 5.0).map(("k", _)).toDF("g", "r")
    assert(Eval.conformalQuantile(tied, "g", "r", 2, 6).head()
      .getDouble(3) == 2.0)
  }

  test("conformalCoverage: guaranteed-level sanity and NULL-qhat honesty") {
    import graft.operators.Eval
    val cal = (1 to 99).map(i => ("k", i.toDouble)).toDF("g", "r")
    val qhat = Eval.conformalQuantile(cal, "g", "r", 1, 10)
    assert(qhat.head().getDouble(3) == 90.0) // k=ceil(100*9/10)=90
    val test = (1 to 100).map(i => ("k", i.toDouble)).toDF("g", "r")
    val cov = Eval.conformalCoverage(test, "g", "r", qhat).head()
    assert(cov.getLong(1) == 100L && cov.getLong(2) == 90L)
    assert(cov.getDouble(3) == 0.9)
    // a key with NULL qhat reports NULL coverage, never 0 or 1
    val tiny = Seq(("k2", 1.0)).toDF("g", "r")
    val noq = Eval.conformalQuantile(tiny, "g", "r", 1, 10)
    val c2 = Eval.conformalCoverage(Seq(("k2", 0.5)).toDF("g", "r"),
      "g", "r", noq).head()
    assert(c2.isNullAt(3))
  }

  // ---- plan shape -------------------------------------------------------

  test("round-8 statistics keep windows over aggregated frames only " +
    "(plan shape)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    import graft.operators.{RankStats, Survival, Eval}
    val df = Seq(("k", "A", 1.0, 2.0)).toDF("g", "grp", "x", "y")
    val units = Seq(("k", 1L, true)).toDF("g", "dur", "ev")
    val plans = Seq(
      RankStats.kruskalWallis(df, "g", "grp", "x"),
      Survival.kaplanMeier(units, "g", "dur", "ev"),
      Eval.conformalQuantile(df, "g", "x", 1, 10))
      .map(_.queryExecution.optimizedPlan)
    plans.foreach { p =>
      val ws = p.collect { case w: LW => w }
      assert(ws.nonEmpty)
      ws.foreach { w =>
        assert(w.partitionSpec.nonEmpty, s"unpartitioned window:\n$w")
        assert(w.collectFirst { case a: Aggregate => a }.isDefined,
          s"window over an un-aggregated frame:\n$w")
      }
    }
    // kendallTau runs no window at all — cell joins only
    val ktPlan = RankStats.kendallTau(df, "g", "x", "y")
      .queryExecution.optimizedPlan
    assert(ktPlan.collect { case w: LW => w }.isEmpty)
  }

  // ---- brute-force cross-checks (r7 KS/MWU/Gini pattern) ----------------

  test("KW/Kendall/KM/conformal agree with brute-force references on a " +
    "hashed fixture") {
    def h(i: Int, salt: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i#$salt".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val rows = (1 to 200).map(i =>
      (h(i, "v") % 13, "g" + (h(i, "s") % 3), h(i, "y") % 7))
    // --- Kruskal-Wallis: pooled average ranks -> per-group doubled sums
    val df = rows.map { case (v, g, _) => ("k", g, v.toDouble) }
      .toDF("key", "grp", "v")
    val all = rows.map(_._1.toDouble)
    val sortedAll = all.sorted
    def avgRankDoubled(x: Double): Long = {
      val lo = sortedAll.indexWhere(_ == x) + 1
      val hi = sortedAll.lastIndexWhere(_ == x) + 1
      lo + hi // 2 * (lo+hi)/2
    }
    val expectedRs = rows.groupBy(_._2).map { case (g, rs) =>
      g -> rs.map(r => avgRankDoubled(r._1.toDouble)).sum
    }
    val kw = graft.operators.RankStats.kruskalWallis(df, "key", "grp", "v")
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(kw == expectedRs)
    // --- Kendall tau-b: brute pair scan
    val xy = rows.map(r => (r._1.toDouble, r._3.toDouble))
    var c = 0L; var d = 0L
    for (i <- xy.indices; j <- (i + 1) until xy.size) {
      val s = (xy(i)._1 - xy(j)._1) * (xy(i)._2 - xy(j)._2)
      if (s > 0) c += 1 else if (s < 0) d += 1
    }
    val kt = graft.operators.RankStats.kendallTau(
      rows.map(r => ("k", r._1.toDouble, r._3.toDouble)).toDF("key", "x", "y"),
      "key", "x", "y").head()
    assert(kt.getLong(2) == c && kt.getLong(3) == d)
    // --- Kaplan-Meier: brute at-risk / events at each distinct duration
    val units = rows.map(r => ("k", r._1, r._3 % 2 == 0))
    val km = graft.operators.Survival.kaplanMeier(
      units.toDF("key", "dur", "ev"), "key", "dur", "ev")
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    units.map(_._2).distinct.foreach { t =>
      val atRisk = units.count(_._2 >= t).toLong
      val events = units.count(u => u._2 == t && u._3).toLong
      assert(km(t) == ((atRisk, events)), s"KM mismatch at t=$t")
    }
    // --- conformal: k-th smallest of the sorted residuals (alpha=1/10)
    val resid = rows.map(_._1.toDouble)
    val kRank = ((resid.size + 1) * 9 + 9) / 10
    val brute = resid.sorted.apply(kRank - 1)
    val cq = graft.operators.Eval.conformalQuantile(
      resid.map(("k", _)).toDF("key", "r"), "key", "r", 1, 10).head()
    assert(cq.getLong(2) == kRank && cq.getDouble(3) == brute)
  }

  // ---- OHLC bars --------------------------------------------------------

  test("ohlcBars: tie-broken open/close, exact extremes and volume") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two events share the OPEN instant: tiebreak (id) picks id=1's 5.0;
    // close is the max-(ts,id) row's 2.0
    val df = Seq(
      ("a", ts("2024-01-01 09:00:00"), 2L, 9.0),
      ("a", ts("2024-01-01 09:00:00"), 1L, 5.0),
      ("a", ts("2024-01-01 15:59:00"), 3L, 1.0),
      ("a", ts("2024-01-01 15:59:00"), 4L, 2.0))
      .toDF("k", "ts", "id", "v")
      .withColumn("day", to_date(col("ts")))
    val r = graft.operators.Timeseries
      .ohlcBars(df, "k", "day", "ts", "id", "v").head()
    assert(r.getLong(2) == 4L)                    // n_events
    assert(r.getDouble(3) == 17.0)                // volume
    assert(r.getDouble(4) == 5.0)                 // open (tie -> id 1)
    assert(r.getDouble(5) == 9.0 && r.getDouble(6) == 1.0) // high/low
    assert(r.getDouble(7) == 2.0)                 // close (max ts, id)
  }

  // ---- streaks ----------------------------------------------------------

  test("streaks: islands split on gaps; longest and last streak exact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // user 1: 1-2-3 Jan, gap, 6-7 Jan -> streaks 3 and 2, last=2
    // user 2: one day
    val df = (Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-06",
      "2024-01-07").map(d => (1L, ts(d))) :+ ((2L, ts("2024-01-05"))))
      .toDF("u", "ts")
    val out = graft.operators.Retention.streaks(df, "u", "ts")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 5L && out(1L).getLong(2) == 2L)
    assert(out(1L).getLong(3) == 3L && out(1L).getLong(4) == 2L)
    assert(out(2L).getLong(3) == 1L && out(2L).getLong(4) == 1L)
    // duplicate same-day events do not inflate streaks
    val dup = Seq((3L, ts("2024-01-01")), (3L, ts("2024-01-01")))
      .toDF("u", "ts")
    assert(graft.operators.Retention.streaks(dup, "u", "ts")
      .head().getLong(3) == 1L)
  }

  // ---- pinball loss -----------------------------------------------------

  test("pinballLoss: exact cent-unit asymmetric terms at q=9/10") {
    // actual 110 vs forecast 100 -> e=+1000c, term 9*1000=9000
    // actual  90 vs forecast 100 -> e=-1000c, term -(-1)*... = 1000
    val df = Seq(("k", 110.0, 100.0), ("k", 90.0, 100.0))
      .toDF("g", "a", "f")
    val r = graft.operators.Eval.pinballLoss(df, "g", "a", "f", 9, 10).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 10000L)
    // mean = 10000 / (2 * 10 * 100) = 5.0 currency units
    assert(r.getDouble(3) == 5.0)
    // under-forecast hurts 9x more than over-forecast at q=0.9
    val under = graft.operators.Eval.pinballLoss(
      Seq(("k", 110.0, 100.0)).toDF("g", "a", "f"), "g", "a", "f", 9, 10)
      .head().getLong(2)
    val over = graft.operators.Eval.pinballLoss(
      Seq(("k", 90.0, 100.0)).toDF("g", "a", "f"), "g", "a", "f", 9, 10)
      .head().getLong(2)
    assert(under == 9L * over)
  }

  // ---- Poisson bootstrap ------------------------------------------------

  test("poissonBootstrap: deterministic md5 multiplicities, exact partials, " +
    "CI brackets the point estimate") {
    import graft.operators.Robust
    val df = (1 to 500).map(i => (i.toLong, 10.0 + (i % 7))).toDF("id", "v")
    val reps = Robust.poissonBootstrap(df, "id", "v", b = 40, salt = "t")
      .localCheckpoint(true)
    assert(reps.count() == 40L)
    // determinism: same salt -> identical partials; new salt -> different
    val again = Robust.poissonBootstrap(df, "id", "v", b = 40, salt = "t")
    assert(reps.orderBy("replicate").collect().toSeq ==
      again.orderBy("replicate").collect().toSeq)
    val other = Robust.poissonBootstrap(df, "id", "v", b = 40, salt = "u")
    assert(reps.orderBy("replicate").collect().toSeq !=
      other.orderBy("replicate").collect().toSeq)
    // replicate 0 matches a host-side md5 replica
    def mult(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#0#t".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(8), 16).toDouble / 4294967296.0
      val cum = Seq(0.36787944117144233, 0.7357588823428847,
        0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
        0.9994058151824183, 0.9999167588507119, 0.9999897508033253,
        0.9999988747974049, 0.9999998885745216)
      cum.indexWhere(h < _) match { case -1 => 10L case m => m.toLong }
    }
    val expN = (1 to 500).map(i => mult(i.toLong)).sum
    val r0 = reps.filter(col("replicate") === 0).head()
    assert(r0.getLong(1) == expN)
    // CI brackets the true mean and is ordered
    val ci = Robust.bootstrapCI(reps, 1, 40, 39, 40).head()
    val trueMean = (1 to 500).map(i => 10.0 + (i % 7)).sum / 500.0
    assert(ci.getLong(0) == 40L)
    assert(ci.getDouble(1) <= ci.getDouble(2))
    assert(ci.getDouble(1) <= trueMean && trueMean <= ci.getDouble(2))
  }

  // ---- churn labels -----------------------------------------------------

  test("churnLabels: leakage-free windows, exact features, honest label") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: active in obs, active in horizon -> retained
      (1L, ts("2024-01-02 10:00:00"), 10.0),
      (1L, ts("2024-01-05 10:00:00"), 20.0),
      (1L, ts("2024-01-18 10:00:00"), 99.0),  // outcome window only
      // user 2: active in obs, silent after -> churned
      (2L, ts("2024-01-03 10:00:00"), 5.0),
      // user 3: only post-obs activity -> EXCLUDED (no features)
      (3L, ts("2024-01-20 10:00:00"), 7.0))
      .toDF("u", "ts", "v")
    val out = graft.operators.Retention.churnLabels(ev, "u", "ts", "v",
      "2024-01-01", "2024-01-16", horizonDays = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L))
    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 2L)
    assert(out(1L).getLong(3) == 3L)              // Jan 2 -> Jan 5 span
    assert(out(1L).getLong(4) == 3000L)           // 10+20 in cents, obs only
    assert(!out(1L).getBoolean(5))
    assert(out(2L).getBoolean(5))
    // an event AFTER the horizon does not rescue the label
    val late = ev.union(Seq((2L, ts("2024-02-20 10:00:00"), 1.0))
      .toDF("u", "ts", "v"))
    assert(graft.operators.Retention.churnLabels(late, "u", "ts", "v",
      "2024-01-01", "2024-01-16", 10)
      .filter(col("u") === 2L).head().getBoolean(5))
  }

  // ---- Qini curve -------------------------------------------------------

  test("qiniCurve: hand-computed uplift; one-arm prefixes yield NULL") {
    // scores desc: 0.9 T+, 0.8 C-, 0.7 T-, 0.6 C+
    val df = Seq((0.9, true, true), (0.8, false, false),
      (0.7, true, false), (0.6, false, true)).toDF("s", "tr", "y")
    val rows = graft.operators.Eval.qiniCurve(df, "s", col("tr"), col("y"))
      .orderBy(col("threshold").desc).collect()
    // t=0.9: only the treated arm present -> NULL uplift
    assert(rows(0).getLong(1) == 1L && rows(0).isNullAt(6))
    // t=0.8: 1T/1pos vs 1C/0pos -> uplift 1.0
    assert(rows(1).getLong(5) == 1L && rows(1).getDouble(6) == 1.0)
    // t=0.6 (all): 2T/1pos vs 2C/1pos -> uplift 0
    assert(rows(3).getLong(5) == 0L && rows(3).getDouble(6) == 0.0)
  }

  // ---- NDCG -------------------------------------------------------------

  test("ndcgAtK: pinned discounts, exact micro sums, micro-averaged ratio") {
    import graft.operators.Eval
    // q1: rel at ranks 1,3 (dcg 1.5e6, nrel 2 -> idcg 1630930)
    // q2: rel at rank 2 only (dcg 630930, idcg 1e6)
    // q3: nothing relevant (0/0 -> contributes nothing)
    val df = Seq(
      ("q1", 1, true), ("q1", 2, false), ("q1", 3, true),
      ("q2", 1, false), ("q2", 2, true), ("q2", 3, false),
      ("q3", 1, false), ("q3", 2, false), ("q3", 3, false))
      .toDF("q", "rank", "rel")
    val r = Eval.ndcgAtK(df, "q", "rank", col("rel"), k = 3).head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 1500000L + 630930L)
    assert(r.getLong(2) == 1630930L + 1000000L)
    assert(r.getDouble(3) == 2130930.0 / 2630930.0)
    // perfect ranking -> exactly 1
    val perfect = Seq(("q", 1, true), ("q", 2, true), ("q", 3, false))
      .toDF("q", "rank", "rel")
    assert(Eval.ndcgAtK(perfect, "q", "rank", col("rel"), 3)
      .head().getDouble(3) == 1.0)
  }

  // ---- log-rank ---------------------------------------------------------

  test("logRankParts: hand-computed observed/expected at each event time") {
    import graft.operators.Survival
    // arm A: events at t=1,2; arm B: event at t=2, censored at t=3
    val units = Seq((true, 1L, true), (true, 2L, true),
      (false, 2L, true), (false, 3L, false)).toDF("a", "dur", "ev")
    val out = Survival.logRankParts(units, col("a"), "dur", "ev")
      .collect().map(r => r.getLong(0) -> r).toMap
    // t=1: risk A=2 B=2, d=1+0 -> E_A = 1*2/4
    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 2L)
    assert(out(1L).getLong(3) == 1L && out(1L).getLong(4) == 0L)
    assert(out(1L).getLong(5) == 2L && out(1L).getLong(6) == 4L)
    assert(out(1L).getDouble(7) == 0.5)
    // t=2: risk A=1 B=2, d=1+1 -> E_A = 2*1/3
    assert(out(2L).getLong(1) == 1L && out(2L).getLong(2) == 2L)
    assert(out(2L).getLong(5) == 2L && out(2L).getLong(6) == 3L)
    assert(out(2L).getDouble(7) == 2.0 / 3.0)
    // t=3 has no events in either arm -> dropped
    assert(!out.contains(3L))
    // observed-vs-expected conservation: sum d_a + d_b = sum d over rows
    assert(out.values.map(r => r.getLong(3) + r.getLong(4)).sum == 3L)
    // hypergeometric variance parts: t=1 -> 1*3*2*2 / (4*4*3)
    assert(out(1L).getLong(8) == 12L && out(1L).getLong(9) == 48L)
    assert(out(1L).getDouble(10) == 0.25)
    // t=2 -> 2*1*1*2 / (3*3*2)
    assert(out(2L).getLong(8) == 4L && out(2L).getLong(9) == 18L)
    assert(out(2L).getDouble(10) == 4.0 / 18.0)
  }

  // ---- dispersion -------------------------------------------------------

  test("dispersionCheck: constant counts -> VMR 0; planted burst >> 1") {
    import graft.operators.Profile
    val const = Seq.fill(10)(("k", 5L)).toDF("g", "c")
    assert(Profile.dispersionCheck(const, "g", "c").head().getDouble(4) == 0.0)
    // 9 zeros + one 100: mean 10, variance-to-mean ratio >> 1
    val burst = (Seq.fill(9)(("k", 0L)) :+ (("k", 100L))).toDF("g", "c")
    val r = Profile.dispersionCheck(burst, "g", "c").head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 100L
      && r.getLong(3) == 10000L)
    // (10*10000 - 100*100) / (10*100) = 90
    assert(r.getDouble(4) == 90.0)
    // zero-total key -> NULL
    val z = Seq(("k", 0L)).toDF("g", "c")
    assert(Profile.dispersionCheck(z, "g", "c").head().isNullAt(4))
  }

  // ---- odds / risk ratio ------------------------------------------------

  test("oddsRatio: textbook 2x2; zero cells go NULL, never infinity") {
    import graft.operators.Robust
    // a=10 b=90 c=5 d=95: OR = 950/450, RR = (10/100)/(5/100) = 2
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(90)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(95)((false, false))
    val df = rows.toDF("ex", "oc").withColumn("k", lit("k"))
    val r = Robust.oddsRatio(df, "k", col("ex"), col("oc")).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 90L
      && r.getLong(3) == 5L && r.getLong(4) == 95L)
    assert(r.getLong(5) == 950L && r.getLong(6) == 450L)
    assert(r.getDouble(7) == 950.0 / 450.0)
    assert(r.getDouble(8) == 2.0)
    // no unexposed outcomes -> NULL ratios (not +inf)
    val zc = (Seq.fill(3)((true, true)) ++ Seq.fill(3)((false, false)))
      .toDF("ex", "oc").withColumn("k", lit("k"))
    val z = Robust.oddsRatio(zc, "k", col("ex"), col("oc")).head()
    assert(z.isNullAt(7) && z.isNullAt(8))
  }

  // ---- readability ------------------------------------------------------

  test("readability: exact word/sentence/syllable counts and the Flesch chain") {
    import graft.llmdata.TextAnalysis
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "no sentence punctuation here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 6 words, 2 sentences, syllables: e-a-a-e-o-a = 6 groups
    assert(out(1L).getLong(1) == 6L && out(1L).getLong(2) == 2L)
    assert(out(1L).getLong(3) == 6L)
    val expected = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(out(1L).getDouble(4) == expected)
    // punctuation-free doc floors at one sentence
    assert(out(2L).getLong(2) == 1L)
    // empty doc: zero words, NULL score
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(4))
  }

  // ---- Lorenz curve -----------------------------------------------------

  test("lorenzCurve: cumulative shares end at 1; one-holder is maximally " +
    "bowed; negatives raise") {
    import graft.operators.RankStats
    val df = Seq(("k", 0.0), ("k", 0.0), ("k", 0.0), ("k", 100.0))
      .toDF("g", "v")
    val rows = RankStats.lorenzCurve(df, "g", "v")
      .orderBy(col("value_micro").asc).collect()
    // first point: 3/4 of the population holds 0 mass
    assert(rows(0).getLong(3) == 3L && rows(0).getLong(4) == 0L)
    assert(rows(0).getDouble(7) == 0.75 && rows(0).getDouble(8) == 0.0)
    // last point closes at (1, 1)
    assert(rows(1).getDouble(7) == 1.0 && rows(1).getDouble(8) == 1.0)
    intercept[Exception] {
      RankStats.lorenzCurve(Seq(("k", -1.0)).toDF("g", "v"), "g", "v")
        .collect()
    }
  }

  // ---- Fleiss kappa -----------------------------------------------------

  test("fleissKappa: textbook integers; perfect agreement -> 1; ragged raises") {
    import graft.operators.Eval
    // 3 items x 3 raters: item1 AAA, item2 AAB, item3 BBB
    val df = Seq((1, "A"), (1, "A"), (1, "A"), (2, "A"), (2, "A"), (2, "B"),
      (3, "B"), (3, "B"), (3, "B")).toDF("item", "cat")
    val r = Eval.fleissKappa(df, "item", "cat").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 6L + 2L + 6L)  // sum k(k-1): 6, (2+0), 6
    assert(r.getLong(3) == 25L + 16L)     // margins 5,4 squared
    // hand kappa: Po = 14/18, Pe = 41/81
    val po = 14.0 / 18.0; val pe = 41.0 / 81.0
    assert(math.abs(r.getDouble(4) - (po - pe) / (1 - pe)) < 1e-12)
    // perfect agreement
    val perfect = Seq((1, "A"), (1, "A"), (2, "B"), (2, "B")).toDF("item", "cat")
    assert(Eval.fleissKappa(perfect, "item", "cat").head().getDouble(4) == 1.0)
    // ragged rating counts raise
    val ragged = Seq((1, "A"), (1, "A"), (2, "B")).toDF("item", "cat")
    intercept[Exception] {
      Eval.fleissKappa(ragged, "item", "cat").collect()
    }
  }

  // ---- Bayesian average -------------------------------------------------

  test("bayesianAverage: small samples shrink to the prior, big samples " +
    "dominate it; exact cross-multiplied rational") {
    import graft.operators.Encode
    // global rate 50/150; cat a: 1/1 raw 100%, cat b: 49/149
    val rows = Seq(("a", true)) ++
      (1 to 149).map(i => ("b", i <= 49))
    val out = Encode.bayesianAverage(rows.toDF("c", "y"), "c", col("y"), 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    // a: (1*150 + 10*50) / (150*11) = 650/1650
    assert(out("a").getLong(3) == 650L && out("a").getLong(4) == 1650L)
    assert(out("a").getDouble(5) == 650.0 / 1650.0)
    // the 1/1 category must NOT outrank the well-sampled 49/149 by much:
    // its smoothed rate is pulled well below 1.0, toward 1/3
    assert(out("a").getDouble(5) < 0.45)
    // b barely moves: (49*150 + 500)/(150*159)
    assert(out("b").getLong(3) == 49L * 150L + 500L)
    assert(math.abs(out("b").getDouble(5) - 49.0 / 149.0) < 0.01)
  }

  // ---- McNemar ----------------------------------------------------------

  test("mcnemar: only discordant cells drive the statistic") {
    import graft.operators.Robust
    // 3 both, 2 neither, 4 a-only, 1 b-only -> delta 3, chi2 9/5
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(2)((false, false)) ++
      Seq.fill(4)((true, false)) ++ Seq.fill(1)((false, true))
    val df = rows.toDF("a", "b").withColumn("k", lit("k"))
    val r = Robust.mcnemar(df, "k", col("a"), col("b")).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 4L && r.getLong(5) == 1L && r.getLong(6) == 3L)
    assert(r.getDouble(7) == 9.0 / 5.0)
    // perfectly concordant -> NULL statistic (no evidence, not zero)
    val conc = Seq((true, true), (false, false)).toDF("a", "b")
      .withColumn("k", lit("k"))
    assert(Robust.mcnemar(conc, "k", col("a"), col("b")).head().isNullAt(7))
  }

  // ---- Brier score ------------------------------------------------------

  test("brierScore: exact micro-grid residuals; perfect forecasts score 0") {
    import graft.operators.Eval
    // (score, label): (0.8, true) -> d=0.2 -> 4e10; (0.4, false) -> 1.6e11
    val df = Seq(("k", 0.8, true), ("k", 0.4, false)).toDF("g", "s", "y")
    val r = Eval.brierScore(df, "g", "s", col("y")).head()
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 40000000000L + 160000000000L)
    assert(r.getDouble(3) == 0.1)       // (0.04 + 0.16) / 2
    val perfect = Seq(("k", 1.0, true), ("k", 0.0, false)).toDF("g", "s", "y")
    val p = Eval.brierScore(perfect, "g", "s", col("y")).head()
    assert(p.getLong(2) == 0L && p.getDouble(3) == 0.0)
    // out-of-[0,1] scores drop rather than poison the statistic
    val junk = Seq(("k", 0.5, true), ("k", 1.5, true)).toDF("g", "s", "y")
    assert(Eval.brierScore(junk, "g", "s", col("y")).head().getLong(1) == 1L)
  }

  // ---- isotonic calibration ---------------------------------------------

  test("isotonicCalibration: violating bins pool to the exact rational; " +
    "monotone fits untouched; output non-decreasing") {
    import graft.operators.Profile
    // nBins=2: bin0 3/4 positive, bin1 1/4 — a violation; PAV pools to 4/8
    val viol = (Seq.fill(3)((0.2, 1L)) ++ Seq((0.2, 0L)) ++
      Seq((0.7, 1L)) ++ Seq.fill(3)((0.7, 0L))).toDF("s", "y")
    val out = Profile.isotonicCalibration(viol, "s", "y", 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(3) == 4L && out(0L).getLong(4) == 8L)
    assert(out(1L).getLong(3) == 4L && out(1L).getLong(4) == 8L)
    assert(out(0L).getDouble(5) == 0.5 && out(1L).getDouble(5) == 0.5)
    // already-monotone rates pass through exactly
    val mono = (Seq((0.2, 0L)) ++ Seq.fill(3)((0.2, 1L)).map(t => (t._1, 0L))
      ++ Seq.fill(3)((0.7, 1L)) ++ Seq((0.7, 0L))).toDF("s", "y")
    val m = Profile.isotonicCalibration(mono, "s", "y", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(m(0L) == 0.0 && m(1L) == 0.75)
    // monotonicity on a hashed multi-bin fixture
    val big = (1 to 400).map { i =>
      val h = (i * 2654435761L) % 1000
      (h / 1000.0, if ((i * 40503 + h) % 7 < 3) 1L else 0L)
    }.toDF("s", "y")
    val fit = Profile.isotonicCalibration(big, "s", "y", 10)
      .orderBy(col("bin").asc).collect().map(_.getDouble(5))
    fit.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
  }

  // ---- SQL catalog ------------------------------------------------------

  test("SqlCatalog: the dbt-style named-view surface resolves raw SQL " +
    "through the full medallion lineage") {
    import org.apache.spark.sql.Row
    import graft.model.Schemas
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def trip(pay: Integer, fare: Double, pickup: String): Row =
      Row(Integer.valueOf(1), ts(pickup),
        ts("2024-01-01 02:10:00"), Integer.valueOf(1),
        java.lang.Double.valueOf(1.5), Integer.valueOf(1), "N",
        Integer.valueOf(1), Integer.valueOf(1), pay,
        java.lang.Double.valueOf(fare), java.lang.Double.valueOf(0.5),
        java.lang.Double.valueOf(0.5), java.lang.Double.valueOf(2.0),
        java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(0.3),
        java.lang.Double.valueOf(13.3), java.lang.Double.valueOf(2.5),
        java.lang.Double.valueOf(1.25))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        trip(1, 10.0, "2024-01-01 00:00:00"),
        trip(2, 20.0, "2024-01-01 01:00:00"),
        trip(7, 30.0, "2024-01-01 02:00:00"))), // pay=7 filtered
      Schemas.trip)
    graft.sql.SqlCatalog.registerLayers(spark, raw)
    assert(spark.sql(
      "SELECT COUNT(*) FROM silver_yellow_tripdata").head().getLong(0) == 2L)
    // a gold mart answers by NAME, matching the DataFrame path
    val viaSql = spark.sql(
      "SELECT trip_count FROM gold_payment_summary ORDER BY payment_description")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == Seq(1L, 1L)) // Cash + Credit card, one trip each
    // source tables register under their own names
    graft.sql.SqlCatalog.registerTables(spark, "/root/testdata/sf0.001")
    assert(spark.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0) > 0L)
  }

  // ---- expected calibration error ---------------------------------------

  test("expectedCalibrationError: exact midpoint ECE; perfectly calibrated " +
    "bins score zero") {
    import graft.operators.Profile
    // nBins=2: bin0 holds 4 rows / 1 pos (acc .25 = mid .25, term 0);
    // bin1 holds 4 rows / 1 pos (acc .25, mid .75, term |4-12|=8)
    val df = Seq(
      (0.1, 1L), (0.2, 0L), (0.3, 0L), (0.4, 0L),
      (0.6, 1L), (0.7, 0L), (0.8, 0L), (0.9, 0L)).toDF("s", "y")
    val r = Profile.expectedCalibrationError(df, "s", "y", 2).head()
    assert(r.getLong(0) == 8L && r.getLong(1) == 8L)
    assert(r.getDouble(2) == 8.0 / (4.0 * 8.0))
    // perfectly midpoint-calibrated: 1/4 pos low bin, 3/4 pos high bin
    val perfect = Seq(
      (0.1, 1L), (0.2, 0L), (0.3, 0L), (0.4, 0L),
      (0.6, 1L), (0.7, 1L), (0.8, 1L), (0.9, 0L)).toDF("s", "y")
    val p = Profile.expectedCalibrationError(perfect, "s", "y", 2).head()
    assert(p.getLong(1) == 0L && p.getDouble(2) == 0.0)
  }
}
