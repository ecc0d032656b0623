package graft

import org.apache.spark.sql.functions._

/** Round-9 operators: macro NDCG, DeLong AUC variance, AP/MAP@k —
  * hand-computed fixtures plus the algebraic identities that pin the
  * doubled-placement and fixed-point conventions. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Eval

  // ---- macro NDCG ---------------------------------------------------------

  test("ndcgMacroAtK: floored per-query micro ratios, zero-rel exclusion") {
    // q1: rel at ranks 1,3 (dcg 1.5e6, idcg 1630930)
    // q2: rel at rank 2 (dcg 630930, idcg 1e6) -> micro exactly 630930
    // q3: nothing relevant -> counted, excluded from the mean
    val df = Seq(
      ("q1", 1, true), ("q1", 2, false), ("q1", 3, true),
      ("q2", 1, false), ("q2", 2, true), ("q2", 3, false),
      ("q3", 1, false), ("q3", 2, false), ("q3", 3, false))
      .toDF("q", "rank", "rel")
    val r = Eval.ndcgMacroAtK(df, "q", "rank", col("rel"), k = 3).head()
    val expected = 1500000L * 1000000L / 1630930L + 630930L
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(r.getLong(2) == expected)
    assert(r.getDouble(3) == expected.toDouble / (2.0 * 1000000.0))
    // all-zero-relevant corpus: NULL macro, never a 0/0
    val none = Seq(("q", 1, false)).toDF("q", "rank", "rel")
    assert(Eval.ndcgMacroAtK(none, "q", "rank", col("rel"), 3)
      .head().isNullAt(3))
  }

  test("ndcgMacroAtK vs ndcgAtK: perfect ranking scores 1 on both averages") {
    val perfect = Seq(("a", 1, true), ("a", 2, true), ("a", 3, false),
      ("b", 1, true), ("b", 2, false), ("b", 3, false))
      .toDF("q", "rank", "rel")
    assert(Eval.ndcgAtK(perfect, "q", "rank", col("rel"), 3)
      .head().getDouble(3) == 1.0)
    // floored micro grid: each query lands exactly on 1e6
    val m = Eval.ndcgMacroAtK(perfect, "q", "rank", col("rel"), 3).head()
    assert(m.getLong(2) == 2000000L && m.getDouble(3) == 1.0)
  }

  // ---- DeLong variance ----------------------------------------------------

  test("deLongVariance: hand-computed placements, variance, tie midpoints") {
    // pos values {1,3}, neg {2,2}: doubled placements p={0,4}, q={2,2}
    val df = Seq(("k", 1.0, true), ("k", 3.0, true),
      ("k", 2.0, false), ("k", 2.0, false)).toDF("g", "v", "pos")
    val r = Eval.deLongVariance(df, "g", "v", col("pos")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)   // n_pos, n_neg
    assert(r.getLong(3) == 4L && r.getLong(4) == 16L)  // sum p, sum p^2
    assert(r.getLong(5) == 4L && r.getLong(6) == 8L)   // sum q, sum q^2
    assert(r.getDouble(7) == 0.5)                       // auc
    assert(r.getDouble(8) == 0.25)                      // var_auc
    // a fully tied pair: placement is the exact midpoint, variance NULL
    val tied = Seq(("k", 2.0, true), ("k", 2.0, false)).toDF("g", "v", "pos")
    val tr = Eval.deLongVariance(tied, "g", "v", col("pos")).head()
    assert(tr.getLong(3) == 1L && tr.getDouble(7) == 0.5 && tr.isNullAt(8))
  }

  test("deLongVariance identities: both placement sums equal 2*np*nn*auc " +
    "and match aucByKey") {
    val df = (1 to 200).map { i =>
      ("k", (i * 7919 % 23).toDouble, i % 3 == 0)
    }.toDF("g", "v", "pos")
    val r = Eval.deLongVariance(df, "g", "v", col("pos")).head()
    val np = r.getLong(1); val nn = r.getLong(2)
    assert(r.getLong(3) == r.getLong(5)) // sum_v10_doubled == sum_v01_doubled
    assert(r.getDouble(7) ==
      r.getLong(3).toDouble / (2.0 * np.toDouble * nn.toDouble))
    val auc = Eval.aucByKey(df, "g", "v", col("pos")).head().getDouble(3)
    assert(r.getDouble(7) == auc)
    assert(!r.isNullAt(8) && r.getDouble(8) > 0.0)
  }

  // ---- pruned read (footer zone maps) -------------------------------------

  test("footerStats + readPruned: footer-only stats prune files, " +
    "pruned scan ≡ full scan, opened-file count bounded") {
    import graft.sources.Tables
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft-prune")
      .toString + "/t"
    spark.range(0, 16000)
      .select(col("id").as("x"), (col("id") % 97).as("y"),
        concat(lit("s"), col("id")).as("s"))
      .repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    val stats = Tables.footerStats(spark, dir, Seq("x", "y"))
    assert(stats.count() == 16)
    assert(stats.agg(sum("n_rows")).head().getLong(0) == 16000L)
    // x-sorted layout: a narrow x-box keeps at most 2 of 16 files
    assert(Layout.candidateFiles(stats, Seq(("x", 0L, 999L))).count() <= 2)
    val pruned = Tables.readPruned(spark, dir, Seq(("x", 0L, 999L)))
    assert(pruned.inputFiles.length <= 2) // the actual I/O skip
    val full = spark.read.parquet(dir)
      .filter(col("x").between(0L, 999L))
    assert(pruned.count() == 1000L && full.count() == 1000L)
    assert(pruned.agg(sum("y")).head().getLong(0)
      == full.agg(sum("y")).head().getLong(0))
    // y is uncorrelated with the sort: every file's y-range covers the
    // probe, nothing prunes — the conservative rule, never a wrong skip
    assert(Layout.candidateFiles(stats, Seq(("y", 5L, 5L))).count() == 16)
    // empty candidate set: zero rows, schema pinned from the full table
    val none = Tables.readPruned(spark, dir, Seq(("x", 100000L, 200000L)))
    assert(none.count() == 0L
      && none.schema.fieldNames.sameElements(Array("x", "y", "s")))
    // footer bounds agree with the data-recomputed audit view
    val audit = Layout.skippingStats(spark, dir, Seq("x"))
      .select("x_min", "x_max").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val foot = stats.select("x_min", "x_max").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(audit.sameElements(foot))
    // non-integral column: NULL bounds => file kept (no evidence rule)
    val sStats = Tables.footerStats(spark, dir, Seq("s"))
    assert(sStats.filter(col("s_min").isNull).count() == 16)
    assert(Layout.candidateFiles(sStats, Seq(("s", 0L, 0L))).count() == 16)
  }

  test("footerStatsString + readPrunedString: lexical zone maps prune " +
    "month-sorted files, pruned ≡ full") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-sprune")
      .toString + "/t"
    val months = (1 to 12).map(m => f"2024-$m%02d")
    val df = months.flatMap(m => (1 to 100).map(i => (m, i.toLong)))
      .toDF("month", "v")
    df.repartitionByRange(12, col("month")).sortWithinPartitions("month")
      .write.parquet(dir)
    val stats = Tables.footerStatsString(spark, dir, Seq("month"))
    assert(stats.count() == 12)
    // every file's [min, max] is one month (tight string bounds)
    assert(stats.filter(col("month_min") === col("month_max")).count() == 12)
    val pruned = Tables.readPrunedString(spark, dir,
      Seq(("month", "2024-03", "2024-05")))
    assert(pruned.inputFiles.length <= 3)
    val full = spark.read.parquet(dir)
      .filter(col("month").between("2024-03", "2024-05"))
    assert(pruned.count() == 300L && full.count() == 300L)
    assert(pruned.agg(sum("v")).head().getLong(0)
      == full.agg(sum("v")).head().getLong(0))
    // out-of-domain probe: zero candidates, schema preserved
    val none = Tables.readPrunedString(spark, dir,
      Seq(("month", "2030-01", "2030-02")))
    assert(none.count() == 0L
      && none.schema.fieldNames.sameElements(Array("month", "v")))
    // integral column probed through the STRING path: NULL bounds, kept
    val vStats = Tables.footerStatsString(spark, dir, Seq("v"))
    assert(vStats.filter(col("v_min").isNull).count() == 12)
  }

  test("footerStats handles INT64 timestamps (micros bounds) and " +
    "rewriteClustered enables both-column pruning") {
    import graft.sources.Tables
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft-tsprune")
      .toString + "/t"
    val df = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
        expr("timestampadd(HOUR, CAST(id AS INT), " +
          "timestamp_ntz'2024-01-01 00:00:00')").as("ts"))
    Layout.rewriteClustered(df, "x", "y", bits = 6, nFiles = 16, dir)
    // timestamp column: INT64 micros stats come back as long bounds
    val ts = Tables.footerStats(spark, dir, Seq("ts"))
    assert(ts.count() == 16 && ts.filter(col("ts_min").isNull).count() == 0)
    val loMicros = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(ts.agg(min("ts_min")).head().getLong(0) == loMicros)
    // hilbert-clustered: a both-column box prunes most files
    val pruned = Tables.readPruned(spark, dir,
      Seq(("x", 0L, 15L), ("y", 0L, 15L)))
    assert(pruned.inputFiles.length * 2 < 16)
    assert(pruned.count() ==
      spark.read.parquet(dir)
        .filter(col("x").between(0L, 15L) && col("y").between(0L, 15L))
        .count())
  }

  test("readPruned plan shape: box predicate reaches PushedFilters and " +
    "ReadSchema stays pruned (file + row-group + column prune stack)") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-planp")
      .toString + "/t"
    spark.range(0, 8000)
      .select(col("id").as("x"), (col("id") % 7).as("y"),
        (col("id") % 11).as("z"))
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    val plan = Tables.readPruned(spark, dir, Seq(("x", 0L, 999L)))
      .groupBy(col("y")).agg(sum(col("x")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(x,0)") &&
      plan.contains("LessThanOrEqual(x,999)"))
    // column prune: the unreferenced z never reaches the scan
    assert(plan.contains("ReadSchema: struct<x:bigint,y:bigint>"))
  }

  // ---- Welch / Mann-Kendall / Krippendorff / Cramér ----------------------

  test("welchTTest: hand-computed moments, t and Welch-Satterthwaite df") {
    import graft.operators.Robust
    val df = Seq(("k", true, 1.0), ("k", true, 2.0), ("k", true, 3.0),
      ("k", false, 2.0), ("k", false, 4.0)).toDF("g", "a", "v")
    val r = Robust.welchTTest(df, "g", "v", col("a")).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 600L && r.getLong(4) == 600L)
    assert(r.getLong(5) == 140000L && r.getLong(6) == 200000L)
    assert(r.getDouble(7) == 2.0 && r.getDouble(8) == 3.0)
    // va = 1.0, vb = 2.0 -> se2 = 1/3 + 1 ; replicate the exact chain
    val sea = 1.0 / 3.0; val seb = 2.0 / 2.0; val se2 = sea + seb
    assert(r.getDouble(9) == (2.0 - 3.0) / math.sqrt(se2))
    assert(r.getDouble(10) ==
      (se2 * se2) / (sea * sea / 2.0 + seb * seb / 1.0))
    // single-row arm: t/df NULL, never a 0-div
    val one = Seq(("k", true, 1.0), ("k", false, 2.0)).toDF("g", "a", "v")
    assert(Robust.welchTTest(one, "g", "v", col("a")).head().isNullAt(9))
  }

  test("mannKendall: pair signs, tie-corrected variance, duplicate-x raise") {
    import graft.operators.RankStats
    val df = Seq(("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 2L), ("k", 4L, 3L))
      .toDF("g", "x", "y")
    val r = RankStats.mannKendall(df, "g", "x", "y").head()
    assert(r.getLong(1) == 4L)     // n
    assert(r.getLong(2) == 5L)     // S = 6 pairs: +,+,+,0,+,+ = 5
    assert(r.getLong(3) == 138L)   // 4*3*13 - 2*1*9
    assert(r.getDouble(4) == 138.0 / 18.0)
    assert(r.getDouble(5) == (5.0 - 1.0) / math.sqrt(138.0 / 18.0))
    // S < 0 branch: reversed series, continuity correction from above
    val rev = Seq(("k", 1L, 3L), ("k", 2L, 2L), ("k", 3L, 1L))
      .toDF("g", "x", "y")
    val rr = RankStats.mannKendall(rev, "g", "x", "y").head()
    assert(rr.getLong(2) == -3L)
    assert(rr.getDouble(5) == (-3.0 + 1.0) / math.sqrt(rr.getDouble(4)))
    val dup = Seq(("k", 1L, 1L), ("k", 1L, 2L)).toDF("g", "x", "y")
    val e = intercept[Exception] {
      RankStats.mannKendall(dup, "g", "x", "y").collect()
    }
    assert(e.getMessage.contains("duplicate x"))
  }

  test("krippendorffAlpha: textbook ragged fixture, m<2 drop, m>21 raise") {
    val df = Seq(
      (1L, "a"), (1L, "a"),             // no disagreement
      (2L, "a"), (2L, "b"),             // full disagreement
      (3L, "b"), (3L, "b"), (3L, "b"),  // no disagreement
      (4L, "a"))                        // single rating: dropped
      .toDF("item", "cat")
    val r = Eval.krippendorffAlpha(df, "item", "cat").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L)
    assert(r.getLong(2) == 2L * 232792560L)  // item2's (4-2)*L/1
    assert(r.getLong(3) == 49L - 9L - 16L)   // N² - Σ N_c²
    assert(r.getDouble(4) == 0.5)            // 1 - 6*2L/(L*24)
    // all-dropped corpus: alpha NULL (de undefined), counts zero
    val singles = Seq((1L, "a"), (2L, "b")).toDF("item", "cat")
    val s = Eval.krippendorffAlpha(singles, "item", "cat").head()
    assert(s.getLong(0) == 0L && s.isNullAt(4))
    val over = (1 to 22).map(i => (1L, s"r$i")).toDF("item", "cat")
    val e = intercept[Exception] {
      Eval.krippendorffAlpha(over, "item", "cat").collect()
    }
    assert(e.getMessage.contains("21"))
  }

  test("cramersV: perfect 2x2 association scores V = 1 (empty-cell mass)") {
    import graft.operators.Robust
    val rows = (1 to 10).map(_ => ("a", "x")) ++ (1 to 10).map(_ => ("b", "y"))
    val r = Robust.cramersV(rows.toDF("u", "v"), "u", "v").head()
    assert(r.getLong(0) == 20L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    // chi2 = n = 20 exactly: 10 micro-units observed + 10 empty-mass
    assert(r.getLong(3) == 20L * 1000000L)
    assert(r.getDouble(4) == 1.0)
    // independence: chi2 terms vanish, V = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val ri = Robust.cramersV(ind, "u", "v").head()
    assert(ri.getLong(3) == 0L && ri.getDouble(4) == 0.0)
    // degenerate single column: V NULL
    val deg = Seq(("a", "x"), ("b", "x")).toDF("u", "v")
    assert(Robust.cramersV(deg, "u", "v").head().isNullAt(4))
  }

  // ---- Hilbert curve -------------------------------------------------------

  test("withHilbert: matches the reference walk, bijective, and every " +
    "consecutive key step moves to an ADJACENT cell (the anti-Morton)") {
    import graft.operators.Layout
    // plain-Scala reference (classic xy2d)
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      val n = 1L << bits
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val bits = 4
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val df = grid.toDF("x", "y")
    val got = Layout.withHilbert(df, "x", "y", bits, "h")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == xy2d(bits, x, y), s"($x,$y)")
    }
    // bijection onto 0..255
    assert(got.values.toSet == (0L until 256L).toSet)
    // Hilbert hallmark: consecutive keys are edge-adjacent cells
    val byD = got.map(_.swap)
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"step $d")
    }
    // Morton, by contrast, has long diagonal jumps — the locality gap
    val mgot = df.withColumn("m",
        Layout.mortonCode(col("x"), col("y"), bits))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .toMap
    val mortonMaxStep = (0L until 255L).map { d =>
      val (x1, y1) = mgot(d); val (x2, y2) = mgot(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(mortonMaxStep > 1)
    // out-of-range / NULL coordinates yield NULL keys
    val bad = Seq((16L, 0L), (0L, -1L)).toDF("x", "y")
    assert(Layout.withHilbert(bad, "x", "y", bits, "h")
      .filter(col("h").isNull).count() == 2)
  }

  test("cohensD: pooled-SD effect size + Hedges factor from the welch " +
    "moments, degenerate NULL") {
    import graft.operators.Robust
    val df = Seq(("k", true, 1.0), ("k", true, 2.0), ("k", true, 3.0),
      ("k", false, 2.0), ("k", false, 4.0)).toDF("g", "a", "v")
    val r = Robust.cohensD(df, "g", "v", col("a")).head()
    // va = 1, vb = 2 -> sp2 = (2*1 + 1*2)/3
    val sp2 = (2.0 * 1.0 + 1.0 * 2.0) / 3.0
    val d = (2.0 - 3.0) / math.sqrt(sp2)
    assert(r.getDouble(5) == d)
    assert(r.getDouble(6) == d * (1.0 - 3.0 / (4.0 * 5.0 - 9.0)))
    // constant values: zero pooled variance -> NULL d
    val const = Seq(("k", true, 2.0), ("k", true, 2.0),
      ("k", false, 2.0), ("k", false, 2.0)).toDF("g", "a", "v")
    assert(Robust.cohensD(const, "g", "v", col("a")).head().isNullAt(5))
  }

  test("jonckheereTerpstra: hand-computed doubled U, tie cell, moments") {
    import graft.operators.RankStats
    // groups 1,2,3 with values {1,2}, {2,3}, {4}: U12 pairs:
    // (1,2)+2 (1,3)+2 (2,2)+1 (2,3)+2 ; U13: (1,4)+2 (2,4)+2
    // U23: (2,4)+2 (3,4)+2 -> J2 = 7 + 4 + 4 = 15
    val df = Seq(("k", 1L, 1L), ("k", 1L, 2L), ("k", 2L, 2L),
      ("k", 2L, 3L), ("k", 3L, 4L)).toDF("g", "grp", "v")
    val r = RankStats.jonckheereTerpstra(df, "g", "grp", "v").head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 15L)
    assert(r.getLong(4) == 25L - (4L + 4L + 1L))         // mean4 = 16
    assert(r.getLong(5) == 25L * 13L - (4 * 7 + 4 * 7 + 1 * 5)) // 264
    assert(r.getDouble(6) ==
      ((15.0 - 16.0 / 2.0) / 2.0) / math.sqrt(264.0 / 72.0))
    // single group: J2 = 0, var 0 -> NULL z
    val one = Seq(("k", 1L, 1L), ("k", 1L, 2L)).toDF("g", "grp", "v")
    assert(RankStats.jonckheereTerpstra(one, "g", "grp", "v")
      .head().isNullAt(6))
  }

  test("kCorePeel: cascading peel, convergence flag, canonicalization") {
    import graft.operators.Graph
    // triangle {1,2,3} + a chain 3-4-5: k=2 peels 5 then 4, keeps the
    // triangle; needs 2 rounds, converges on the 3rd
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (2L, 1L), (3L, 3L)) // duplicate reversed edge + self-loop dropped
      .toDF("s", "t")
    val r = Graph.kCorePeel(e, "s", "t", k = 2, rounds = 4)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2))))
      .toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r.values.forall { case (deg, conv) => deg == 2L && conv })
    // rounds too few to converge: flag false, partial peel reported
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "t")
    val p = Graph.kCorePeel(chain, "s", "t", k = 2, rounds = 1)
    assert(!p.head().getBoolean(2)) // one round only removed 1 and 5
    // full peel of a pure chain at k=2: empty core
    assert(Graph.kCorePeel(chain, "s", "t", 2, 6).count() == 0)
  }

  test("friedmanParts: textbook blocked ranks, tie midranks, ragged raise") {
    import graft.operators.RankStats
    // 3 blocks × 3 treatments, values give within-block ranks
    // b1: t1=1,t2=2,t3=3 ; b2: t1=1,t2=3,t3=2 ; b3: t1=1,t2=2,t3=3
    val df = Seq(
      ("b1", "t1", 10L), ("b1", "t2", 20L), ("b1", "t3", 30L),
      ("b2", "t1", 5L), ("b2", "t2", 25L), ("b2", "t3", 15L),
      ("b3", "t1", 1L), ("b3", "t2", 2L), ("b3", "t3", 3L))
      .toDF("b", "t", "v")
    val r = RankStats.friedmanParts(df, "b", "t", "v")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // doubled rank sums: t1: 2+2+2=6, t2: 4+6+4=14, t3: 6+4+6=16
    assert(r("t1")._3 == 6L && r("t2")._3 == 14L && r("t3")._3 == 16L)
    // chi2 = 3*(36+196+256)/(3*3*4) - 3*3*4 = 488/12*... replicate chain
    val chi2 = 3.0 * 488.0 / (3.0 * 3.0 * 4.0) - 3.0 * 3.0 * 4.0
    assert(r("t1")._4 == chi2 && r("t1")._1 == 3L && r("t1")._2 == 3L)
    // a tie within a block takes the doubled midrank
    val tie = Seq(("b", "t1", 1L), ("b", "t2", 1L), ("b", "t3", 2L))
      .toDF("b", "t", "v")
    val tr = RankStats.friedmanParts(tie, "b", "t", "v")
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(tr("t1") == 3L && tr("t2") == 3L && tr("t3") == 6L)
    val ragged = Seq(("b1", "t1", 1L), ("b1", "t2", 2L), ("b2", "t1", 1L))
      .toDF("b", "t", "v")
    val e = intercept[Exception] {
      RankStats.friedmanParts(ragged, "b", "t", "v").collect()
    }
    assert(e.getMessage.contains("ragged"))
    // equal-size blocks with DISJOINT treatment sets are ALSO ragged
    // (per-block counts alone would pass them; the global-k guard
    // catches the disjoint design) — the r9 ADVICE case
    val disjoint = Seq(("b1", "t1", 1L), ("b1", "t2", 2L),
      ("b2", "t3", 1L), ("b2", "t4", 2L)).toDF("b", "t", "v")
    val e2 = intercept[Exception] {
      RankStats.friedmanParts(disjoint, "b", "t", "v").collect()
    }
    assert(e2.getMessage.contains("ragged"))
  }

  test("durbinWatson + runsTest: hand series, alternating vs trending") {
    import graft.operators.Timeseries
    // y = 1,3,1,3 (n=4, S=8 -> e = 4y-8 = -4,4,-4,4 cents*100)
    val alt = Seq(("k", 1L, 1.0), ("k", 2L, 3.0), ("k", 3L, 1.0),
      ("k", 4L, 3.0)).toDF("g", "x", "v")
    val dw = Timeseries.durbinWatson(alt, "g", "x", "v").head()
    // e in cents: -400,400,-400,400; num = 3*(800^2); den = 4*400^2
    assert(dw.getLong(2) == 3L * 800L * 800L)
    assert(dw.getLong(3) == 4L * 400L * 400L)
    assert(dw.getDouble(4) == (3.0 * 640000.0) / 640000.0)
    val rt = Timeseries.runsTest(alt, "g", "x", "v").head()
    assert(rt.getLong(1) == 2L && rt.getLong(2) == 2L && rt.getLong(3) == 4L)
    // max runs for 2+2: z = (4 - (1 + 2*2*2/4)) / sqrt(vr)
    val p = 2.0; val m = 2.0; val nn = 4.0
    val vr = (2.0 * p * m * (2.0 * p * m - nn)) / (nn * nn * (nn - 1.0))
    assert(rt.getDouble(4) == (4.0 - (1.0 + 2.0 * p * m / nn)) /
      math.sqrt(vr))
    // monotone series: minimal runs (2), DW small
    val tr2 = Timeseries.runsTest(Seq(("k", 1L, 1.0), ("k", 2L, 2.0),
      ("k", 3L, 8.0), ("k", 4L, 9.0)).toDF("g", "x", "v"),
      "g", "x", "v").head()
    assert(tr2.getLong(3) == 2L)
    // duplicate x raises
    val dup = Seq(("k", 1L, 1.0), ("k", 1L, 2.0)).toDF("g", "x", "v")
    assert(intercept[Exception] {
      Timeseries.durbinWatson(dup, "g", "x", "v").collect()
    }.getMessage.contains("duplicate x"))
  }

  test("bowkerSymmetry: hand 3x3 transitions, one-sided pairs, diagonal " +
    "ignored") {
    import graft.operators.Robust
    // n_ab=3, n_ba=1 -> term (2)²/4 = 1.0 ; n_ac=2, n_ca=0 -> 4/2 = 2.0
    // n_bc=n_cb=0 -> pair absent ; diagonals never contribute
    val rows = Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(2)(("a", "c")) ++ Seq.fill(4)(("a", "a")) ++ Seq(("c", "c"))
    val r = Robust.bowkerSymmetry(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getLong(0) == 11L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 2L) // two traffic-bearing pairs
    assert(r.getLong(3) == 3000000L && r.getDouble(4) == 3.0)
    // perfectly symmetric table: chi2 = 0
    val sym = Seq(("a", "b"), ("b", "a")).toDF("x", "y")
    assert(Robust.bowkerSymmetry(sym, "x", "y").head().getLong(3) == 0L)
  }

  test("linConcordance: perfect agreement = 1, shift penalized below " +
    "Pearson, degenerate NULL") {
    val same = Seq(("k", 1.0, 1.0), ("k", 2.0, 2.0), ("k", 3.0, 3.0))
      .toDF("g", "x", "y")
    assert(Eval.linConcordance(same, "g", "x", "y").head().getDouble(4)
      == 1.0)
    // y = x + 10: Pearson r = 1 but CCC < 1 (location shift penalized)
    val shift = Seq(("k", 1.0, 11.0), ("k", 2.0, 12.0), ("k", 3.0, 13.0))
      .toDF("g", "x", "y")
    val r = Eval.linConcordance(shift, "g", "x", "y").head()
    // num = 2*(3*Σxy − ΣxΣy); hand: x=100,200,300 y=1100,1200,1300
    // cov part: 3*(110000+240000+390000) − 600*3600 = 2220000−2160000
    assert(r.getLong(2) == 2L * 60000L)
    assert(r.getLong(3) == 60000L + 60000L + 3000L * 3000L)
    assert(r.getDouble(4) == 120000.0 / 9120000.0)
    // constant equal pair: den 0 -> NULL
    val const = Seq(("k", 2.0, 2.0), ("k", 2.0, 2.0)).toDF("g", "x", "y")
    assert(Eval.linConcordance(const, "g", "x", "y").head().isNullAt(4))
  }

  test("kendallW: perfect block agreement -> W = 1; cliffsDelta: full " +
    "separation -> ±1, identity a+d") {
    import graft.operators.RankStats
    // every block ranks t1 < t2 < t3 identically -> W = 1
    val agree = (1 to 4).flatMap(b => Seq((s"b$b", "t1", 1L),
      (s"b$b", "t2", 2L), (s"b$b", "t3", 3L))).toDF("b", "t", "v")
    val w = RankStats.kendallW(agree, "b", "t", "v").head()
    assert(w.getDouble(3) == 1.0)
    // A strictly above B: delta = +1; reversed: -1; overlap: between
    val sep = Seq(("k", true, 10.0), ("k", true, 11.0),
      ("k", false, 1.0), ("k", false, 2.0)).toDF("g", "a", "v")
    assert(RankStats.cliffsDelta(sep, "g", "v", col("a"))
      .head().getDouble(5) == 1.0)
    assert(RankStats.cliffsDelta(sep, "g", "v", !col("a"))
      .head().getDouble(5) == -1.0)
    val tie = Seq(("k", true, 1.0), ("k", false, 1.0)).toDF("g", "a", "v")
    assert(RankStats.cliffsDelta(tie, "g", "v", col("a"))
      .head().getDouble(5) == 0.0)
  }

  // ---- Cochran-Armitage ---------------------------------------------------

  test("cochranArmitage: hand-computed trend parts, degenerate NULL z, " +
    "non-binary success raises") {
    import graft.operators.Robust
    // doses 1,2,3 with success counts 0/2, 1/2, 2/2 — a clean trend
    val df = Seq(("k", 1L, 0L), ("k", 1L, 0L), ("k", 2L, 0L), ("k", 2L, 1L),
      ("k", 3L, 1L), ("k", 3L, 1L)).toDF("g", "w", "r")
    val r = Robust.cochranArmitage(df, "g", "w", "r").head()
    // N=6 R=3 B=12 A=28 Swr=8: t=6*8-3*12=12; rn=9; nab=6*28-144=24
    assert(r.getLong(1) == 6L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 12L && r.getLong(4) == 9L && r.getLong(5) == 24L)
    assert(r.getDouble(6) == 12.0 / math.sqrt(9.0 * 24.0 / 6.0))
    // all-success key: rn_r = 0 -> NULL z
    val allS = Seq(("k", 1L, 1L), ("k", 2L, 1L)).toDF("g", "w", "r")
    assert(Robust.cochranArmitage(allS, "g", "w", "r").head().isNullAt(6))
    // constant weight: na_b2 = 0 -> NULL z
    val cw = Seq(("k", 2L, 0L), ("k", 2L, 1L)).toDF("g", "w", "r")
    assert(Robust.cochranArmitage(cw, "g", "w", "r").head().isNullAt(6))
    val bad = Seq(("k", 1L, 2L)).toDF("g", "w", "r")
    val e = intercept[Exception] {
      Robust.cochranArmitage(bad, "g", "w", "r").collect()
    }
    assert(e.getMessage.contains("0/1"))
  }

  // ---- preference QC / CM inner product / purged k-fold -------------------

  test("preferenceStats + annotatorAgreement: deterministic majority, " +
    "tie -> smallest, single-ballot items excluded from agreement") {
    val df = Seq(
      (1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "b"), // majority a
      (2L, "r1", "b"), (2L, "r2", "a"),                  // tie -> 'a'
      (3L, "r3", "b"))                                   // single ballot
      .toDF("item", "rater", "choice")
    val ps = Eval.preferenceStats(df, "item", "choice")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(ps(1L) == ((3L, 2L, "a", 2L)))
    assert(ps(2L) == ((2L, 2L, "a", 1L))) // tie broken to smallest choice
    assert(ps(3L) == ((1L, 1L, "b", 1L)))
    val aa = Eval.annotatorAgreement(df, "item", "rater", "choice")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // item 3 (single ballot) is excluded: r3 has 1 counted ballot
    assert(aa("r1") == ((2L, 1L))) // a@1 agree, b@2 disagree
    assert(aa("r2") == ((2L, 2L))) // a@1 agree, a@2 agree (tie majority)
    assert(aa("r3") == ((1L, 0L))) // only the item-1 'b' vote counts
  }

  test("countMin innerProduct: exact join size in the no-collision " +
    "regime, zero overlap -> 0") {
    import graft.functions.CountMin
    val a = CountMin.partial(Seq("x", "x", "y").toDF("i"), "i", 3, 256, "t")
    val b = CountMin.partial(Seq("x", "z").toDF("i"), "i", 3, 256, "t")
    // true join size = f_A(x)·f_B(x) = 2
    assert(CountMin.innerProduct(a, b, 3).head().getLong(0) == 2L)
    val c = CountMin.partial(Seq("q").toDF("i"), "i", 3, 256, "t")
    assert(CountMin.innerProduct(a, c, 3).head().getLong(0) == 0L)
  }

  test("purgedKFold: contiguous row-balanced folds, embargo purges the " +
    "margin, ties never straddle a boundary") {
    import graft.llmdata.Sampling
    val ts = (1 to 10).map(i => (i.toLong, f"2024-01-$i%02d 00:00:00"))
    val df = ts.toDF("id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = Sampling.purgedKFold(df, "ts", k = 2, embargoSeconds = 86400L)
    val byRole = out.groupBy("fold", "role").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // fold 0 = days 1-5, fold 1 = days 6-10
    assert(byRole((0, "test")) == 5L && byRole((1, "test")) == 5L)
    // day 6 is exactly min+1d from day 5: NOT strictly outside -> purged
    assert(byRole((0, "purged")) == 1L && byRole((0, "train")) == 4L)
    assert(byRole((1, "purged")) == 1L && byRole((1, "train")) == 4L)
    // duplicate timestamps stay in one fold (no straddle)
    val dup = (1 to 4).map(i => (i.toLong, "2024-01-01 00:00:00")) ++
      (5 to 8).map(i => (i.toLong, "2024-01-05 00:00:00"))
    val dout = Sampling.purgedKFold(
      dup.toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp_ntz")),
      "ts", 2, 0L)
    val folds = dout.filter(col("role") === "test")
      .select("ts", "fold").distinct().collect()
      .map(r => r.get(0).toString -> r.getInt(1)).toMap
    assert(folds.size == 2 && folds.values.toSet == Set(0, 1))
  }

  // ---- t-closeness / Count-Min --------------------------------------------

  test("tCloseness: hand EMD, NULL qi is a class, NULL sensitive excluded") {
    import graft.checks.Privacy
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "b"), ("g2", "b"), ("g2", "b"))
      .toDF("seg", "s")
    val r = Privacy.tCloseness(df, Seq("seg"), "s", t = 0.2)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4)))).toMap
    // global: a=2, b=4, N=6, m=2; both classes: |cumc*6 - 2*3| = 6
    assert(r("g1") == ((3L, 6L, 6.0 / 18.0, true)))
    assert(r("g2") == ((3L, 6L, 6.0 / 18.0, true)))
    // NULL qi forms its own class and still matches its cells
    val withNull = Seq((Some("g1"), "a"), (None: Option[String], "a"),
      (None, "b")).toDF("seg", "s")
    val nr = Privacy.tCloseness(withNull, Seq("seg"), "s", 0.2)
      .filter(col("seg").isNull).head()
    assert(nr.getLong(1) == 2L) // the NULL class saw both its rows
    // NULL sensitive rows are excluded entirely
    val ns = Seq(("g", Some("a")), ("g", None: Option[String]))
      .toDF("seg", "s")
    assert(Privacy.tCloseness(ns, Seq("seg"), "s", 0.2)
      .head().getLong(1) == 1L)
    // identical distribution => EMD 0, not at risk
    val same = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"))
      .toDF("seg", "s")
    assert(Privacy.tCloseness(same, Seq("seg"), "s", 0.2)
      .collect().forall(x => x.getLong(2) == 0L && !x.getBoolean(4)))
  }

  test("countMin: exact in the no-collision regime, merge ≡ one-shot, " +
    "est is an upper bound, unseen probe -> 0") {
    import graft.functions.CountMin
    val items = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z"))
      .toDF("item")
    val oneShot = CountMin.partial(items, "item", 3, 256, "s")
    val merged = CountMin.merge(Seq(
      CountMin.partial(items.limit(4), "item", 3, 256, "s"),
      CountMin.partial(
        items.withColumn("__r", monotonically_increasing_id())
          .filter(col("__r") >= 4).drop("__r"), "item", 3, 256, "s")))
    val a = oneShot.orderBy("d", "w").collect().toSeq
    val b = merged.orderBy("d", "w").collect().toSeq
    assert(a == b)
    val est = CountMin.estimate(oneShot,
      Seq("x", "y", "z", "never").toDF("item"), "item", 3, 256, "s")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("x") == 5L && est("y") == 3L && est("z") == 1L)
    assert(est("never") == 0L)
    // collision regime (width 2): still an upper bound on every count
    val tight = CountMin.estimate(
      CountMin.partial(items, "item", 2, 2, "s"),
      Seq("x", "y", "z").toDF("item"), "item", 2, 2, "s")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight("x") >= 5L && tight("y") >= 3L && tight("z") >= 1L)
  }

  // ---- AP / MAP -----------------------------------------------------------

  test("averagePrecisionAtK: exact 2520-scaled terms, hand-checked APs") {
    val df = Seq(
      ("q1", 1, true), ("q1", 2, false), ("q1", 3, true),
      ("q2", 1, false), ("q2", 2, true), ("q2", 3, false),
      ("q3", 1, false), ("q3", 2, false), ("q3", 3, false))
      .toDF("q", "rank", "rel")
    val out = Eval.averagePrecisionAtK(df, "q", "rank", col("rel"), k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    // q1: 2520*1/1 + 2520*2/3 = 2520 + 1680; AP = (1 + 2/3)/2
    assert(out("q1").getLong(3) == 4200L)
    assert(out("q1").getDouble(4) == 4200.0 / (2520.0 * 2.0))
    // q2: 2520*1/2; AP = 0.5
    assert(out("q2").getLong(3) == 1260L && out("q2").getDouble(4) == 0.5)
    // q3: no hits -> NULL AP
    assert(out("q3").getLong(2) == 0L && out("q3").isNullAt(4))
  }

  test("NULL relevance counts as non-relevant, never row-dropped " +
    "(oracle convention)") {
    // q1's only retained row is NULL-labeled: the query must still be
    // counted (n_queries) with idcg=0 / r_k=0, exactly as the DuckDB
    // oracles score it — dropping the row would erase the query.
    val df = Seq(("q1", 1, None: Option[Boolean]),
      ("q2", 1, Some(true)), ("q2", 2, None)).toDF("q", "rank", "rel")
    val n = Eval.ndcgMacroAtK(df, "q", "rank", col("rel"), k = 3).head()
    assert(n.getLong(0) == 2L && n.getLong(1) == 1L) // q1 counted, zero-rel
    val ap = Eval.averagePrecisionAtK(df, "q", "rank", col("rel"), k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ap("q1").getLong(1) == 1L && ap("q1").getLong(2) == 0L)
    assert(ap("q2").getLong(1) == 2L && ap("q2").getLong(2) == 1L)
    val m = Eval.mapAtK(df, "q", "rank", col("rel"), k = 3).head()
    assert(m.getLong(0) == 2L && m.getLong(1) == 1L)
  }

  test("churnLabels: outcome window derived from obsEnd's full timestamp") {
    import graft.operators.Retention
    // obsEnd carries 12:00 — an event 23h after obsEnd must count as
    // outcome activity for horizonDays=1 (window [obsE, obsE+24h)); the
    // old date-midnight derivation made the window only 12h wide.
    val ev = Seq(
      ("u1", "2024-01-05 08:00:00", 10.0),            // obs activity
      ("u1", "2024-01-10 11:00:00", 5.0),             // 23h into horizon
      ("u2", "2024-01-05 09:00:00", 20.0))            // churns
      .toDF("user_id", "ts", "amount")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val r = Retention.churnLabels(ev, "user_id", "ts", "amount",
      obsStart = "2024-01-01 00:00:00", obsEnd = "2024-01-09 12:00:00",
      horizonDays = 1)
      .collect().map(x => x.getString(0) -> x.getBoolean(5)).toMap
    assert(!r("u1") && r("u2"))
  }

  test("mapAtK: floored micro APs, zero-hit queries count as zero") {
    val df = Seq(
      ("q1", 1, true), ("q1", 2, false), ("q1", 3, true),
      ("q2", 1, false), ("q2", 2, true),
      ("q3", 1, false)).toDF("q", "rank", "rel")
    val r = Eval.mapAtK(df, "q", "rank", col("rel"), k = 3).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    val expected = 1000000L * 4200L / 5040L + 500000L
    assert(r.getLong(2) == expected)
    assert(r.getDouble(3) == expected.toDouble / (3.0 * 1000000.0))
    // perfect retrieval: MAP exactly 1
    val perfect = Seq(("q", 1, true), ("q", 2, true)).toDF("q", "rank", "rel")
    assert(Eval.mapAtK(perfect, "q", "rank", col("rel"), 3)
      .head().getDouble(3) == 1.0)
  }
}
