package graft

import org.apache.spark.sql.functions._

/** Round-10 operators: typed (Long|Double|String) footer zone maps,
  * the distributed footer pass, and heterogeneous-box pruned reads. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("footerStatsTyped: Double + String + Long bounds in one pass, " +
    "distributed ≡ driver loop, unsupported types NULL") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-typed")
      .toString + "/t"
    spark.range(0, 8000)
      .select(col("id").as("x"),
        (col("id").cast("double") / 100.0).as("price"),
        concat(lit("m"), lpad(expr("id div 1000").cast("string"), 2, "0"))
          .as("mk"),
        col("id").cast("decimal(10,2)").as("dec"))
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    val cols = Seq("x", "price", "mk", "dec")
    val dist = Tables.footerStatsKinds(spark, dir, cols,
      Seq('L', 'D', 'S', 'X'), distributed = true)
    val loop = Tables.footerStatsKinds(spark, dir, cols,
      Seq('L', 'D', 'S', 'X'), distributed = false)
    assert(dist.count() == 8 && loop.count() == 8)
    // distributed pass ≡ the reference driver loop, row for row
    val d = dist.orderBy("path").collect().map(_.toSeq)
    val l = loop.orderBy("path").collect().map(_.toSeq)
    assert(d.length == l.length && d.zip(l).forall { case (a, b) => a == b })
    // schema-derived kinds agree with the pinned ones
    val typed = Tables.footerStatsTyped(spark, dir, cols)
      .orderBy("path").collect().map(_.toSeq)
    assert(typed.zip(d).forall { case (a, b) => a == b })
    // double bounds agree with the data-recomputed audit view
    import graft.operators.Layout
    val audit = Layout.skippingStats(spark, dir, Seq("price"))
      .select("price_min", "price_max").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sorted
    val foot = dist.select("price_min", "price_max").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sorted
    assert(audit.sameElements(foot))
    // decimal (unscaled INT64 physical would lie) => always-NULL bounds
    assert(dist.filter(col("dec_min").isNull && col("dec_max").isNull)
      .count() == 8)
  }

  test("readPrunedBox: mixed Long+Double+String box prunes files and " +
    "matches the full scan; double-only money box prunes too") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-box")
      .toString + "/t"
    spark.range(0, 8000)
      .select(col("id").as("x"),
        (col("id").cast("double") / 100.0).as("price"),
        concat(lit("m"), lpad(expr("id div 1000").cast("string"), 2, "0"))
          .as("mk"))
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    // value-sorted layout => x, price, and mk are all correlated with
    // the file cut; a mixed box on all three keeps ~1 of 8 files
    val pruned = Tables.readPrunedBox(spark, dir,
      Seq(("x", 0L, 999L), ("price", 0.0, 9.99), ("mk", "m00", "m00")))
    assert(pruned.inputFiles.length <= 2)
    val full = spark.read.parquet(dir).filter(
      col("x").between(0L, 999L) && col("price").between(0.0, 9.99)
        && col("mk").between("m00", "m00"))
    assert(pruned.count() == full.count() && full.count() == 1000L)
    assert(pruned.agg(sum("x")).head().getLong(0)
      == full.agg(sum("x")).head().getLong(0))
    // the money-column box alone (the reference's SLO predicate shape)
    val money = Tables.readPrunedBox(spark, dir,
      Seq(("price", 70.0, 75.5)))
    assert(money.inputFiles.length <= 2)
    assert(money.count() == spark.read.parquet(dir)
      .filter(col("price").between(70.0, 75.5)).count())
    // empty candidates: schema pinned, zero rows
    val none = Tables.readPrunedBox(spark, dir, Seq(("price", 1e9, 2e9)))
    assert(none.count() == 0L
      && none.schema.fieldNames.sameElements(Array("x", "price", "mk")))
  }

  test("mortonCodeN: 3-D interleave matches plain-Scala reference, " +
    "2-col form ≡ mortonCode, NULL on out-of-range") {
    import graft.operators.Layout
    def ref(xs: Seq[Long], bits: Int): Long =
      (0 until bits).flatMap(i => xs.zipWithIndex.map { case (x, j) =>
        ((x >> i) & 1L) << (i * xs.size + j)
      }).sum
    val grid = for (x <- 0L to 7L; y <- 0L to 7L; z <- 0L to 7L)
      yield (x, y, z)
    val df = grid.toDF("x", "y", "z")
      .withColumn("k",
        Layout.mortonCodeN(Seq(col("x"), col("y"), col("z")), 3))
    val rows = df.collect()
    assert(rows.forall(r =>
      r.getLong(3) == ref(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 3)))
    // bijection over the full 8x8x8 grid
    assert(df.select("k").distinct().count() == 512)
    // 2-column form agrees with the original mortonCode
    val two = Seq((3L, 5L), (0L, 0L), (7L, 1L)).toDF("x", "y")
      .withColumn("a", Layout.mortonCode(col("x"), col("y"), 3))
      .withColumn("b", Layout.mortonCodeN(Seq(col("x"), col("y")), 3))
    assert(two.filter(col("a") =!= col("b")).count() == 0)
    // out-of-range / NULL => NULL key (loud in any sort)
    val bad = Seq((8L, 0L, 0L), (-1L, 0L, 0L)).toDF("x", "y", "z")
      .withColumn("k",
        Layout.mortonCodeN(Seq(col("x"), col("y"), col("z")), 3))
    assert(bad.filter(col("k").isNull).count() == 2)
    // n*bits budget guard
    intercept[IllegalArgumentException] {
      Layout.mortonCodeN(Seq(col("x"), col("y"), col("z")), 21)
    }
  }

  test("ordinalAssociation: hand-counted C/D/ties give gamma, Somers' D, " +
    "tau_b on one fixture") {
    import graft.operators.RankStats
    // cells (x,y): (1,1),(1,2),(2,1),(2,2),(3,3) — C=5, D=1,
    // tie_x=2 (two x-groups of 2), tie_y=2, n0=10
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 3L))
      .toDF("x", "y").withColumn("k", lit("a"))
    val r = RankStats.ordinalAssociation(df, "k", "x", "y").head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 5L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 2L && r.getLong(5) == 2L)
    assert(r.getDouble(6) == 4.0 / (math.sqrt(8.0) * math.sqrt(8.0))) // tau_b
    assert(r.getDouble(7) == 4.0 / 6.0)  // gamma
    assert(r.getDouble(8) == 4.0 / 8.0)  // somers_d_yx
  }

  test("pageTrend: perfect monotone trend scores the textbook z") {
    import graft.operators.RankStats
    // 2 blocks x 3 ascending treatments: ranks 1,2,3 in every block ->
    // R2 = (4, 8, 12), l2 = 56, E[2L] = 48, Var[L] = 4, z = 2
    val df = Seq(
      ("b1", "t1", 10L), ("b1", "t2", 20L), ("b1", "t3", 30L),
      ("b2", "t1", 1L), ("b2", "t2", 2L), ("b2", "t3", 3L))
      .toDF("b", "t", "v")
    val r = RankStats.pageTrend(df, "b", "t", "v").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 56L && r.getDouble(3) == 2.0)
    // k = 2: l2 still exact, z NULL (no order to trend over)
    val two = Seq(("b1", "t1", 1L), ("b1", "t2", 2L)).toDF("b", "t", "v")
    assert(RankStats.pageTrend(two, "b", "t", "v").head().isNullAt(3))
  }

  test("cochranQ: textbook 3x3 binary fixture, ragged + non-binary raise") {
    import graft.operators.RankStats
    // C = (2,1,0), R = (2,1,0), N = 3:
    // q_num = 2*(3*5 - 9) = 12, q_den = 9 - 5 = 4, Q = 3
    val df = Seq(
      ("b1", "t1", 1), ("b1", "t2", 1), ("b1", "t3", 0),
      ("b2", "t1", 1), ("b2", "t2", 0), ("b2", "t3", 0),
      ("b3", "t1", 0), ("b3", "t2", 0), ("b3", "t3", 0))
      .toDF("b", "t", "s")
    val r = RankStats.cochranQ(df, "b", "t", "s").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 12L && r.getLong(4) == 4L
      && r.getDouble(5) == 3.0)
    // degenerate: every block all-1 -> q_den = 0 -> NULL Q
    val allOne = Seq(("b1", "t1", 1), ("b1", "t2", 1),
      ("b2", "t1", 1), ("b2", "t2", 1)).toDF("b", "t", "s")
    assert(RankStats.cochranQ(allOne, "b", "t", "s").head().isNullAt(5))
    val ragged = Seq(("b1", "t1", 1), ("b2", "t1", 0), ("b2", "t2", 1))
      .toDF("b", "t", "s")
    val e = intercept[Exception] {
      RankStats.cochranQ(ragged, "b", "t", "s").collect()
    }
    assert(e.getMessage.contains("ragged"))
    val nonBin = Seq(("b1", "t1", 2), ("b1", "t2", 0)).toDF("b", "t", "s")
    val e2 = intercept[Exception] {
      RankStats.cochranQ(nonBin, "b", "t", "s").collect()
    }
    assert(e2.getMessage.contains("0-1"))
  }

  test("writeManifest + readPrunedManifest: manifest plan ≡ live-footer " +
    "plan, data scans don't see the manifest dir, absent column raises") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-mspec")
      .toString + "/t"
    spark.range(0, 8000)
      .select(col("id").as("x"), (col("id") % 97).as("y"))
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    val before = Tables.footerStats(spark, dir, Seq("x"))
      .orderBy("path").collect().map(_.toSeq)
    Tables.writeManifest(spark, dir, Seq("x"))
    // the _-prefixed manifest dir is invisible to data scans AND to a
    // fresh footer pass over the same root
    assert(spark.read.parquet(dir).count() == 8000L)
    val after = Tables.footerStats(spark, dir, Seq("x"))
      .orderBy("path").collect().map(_.toSeq)
    assert(before.length == after.length
      && before.zip(after).forall { case (a, b) => a == b })
    val box = Seq[(String, Any, Any)](("x", 0L, 999L))
    val m = Tables.readPrunedManifest(spark, dir, box)
    val live = Tables.readPrunedBox(spark, dir, box)
    assert(m.inputFiles.sorted.sameElements(live.inputFiles.sorted))
    assert(m.inputFiles.length <= 2 && m.count() == 1000L)
    // a column the manifest doesn't carry raises (never a silent
    // full scan)
    intercept[IllegalArgumentException] {
      Tables.readPrunedManifest(spark, dir, Seq[(String, Any, Any)](
        ("y", 0L, 1L)))
    }
  }

  test("refreshManifest: only new footers scanned, vanished files " +
    "dropped, column-set mismatch raises") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-rspec")
      .toString + "/t"
    spark.range(0, 4000).select(col("id").as("x"))
      .repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    Tables.writeManifest(spark, dir, Seq("x"))
    // no change -> nothing scanned, manifest intact
    assert(Tables.refreshManifest(spark, dir, Seq("x")) == 0L)
    spark.range(4000, 6000).select(col("id").as("x"))
      .repartitionByRange(2, col("x")).sortWithinPartitions("x")
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    val n = spark.read.parquet(dir).inputFiles.length
    assert(Tables.refreshManifest(spark, dir, Seq("x")) == (n - 4).toLong)
    val man = spark.read.parquet(s"$dir/_graft_manifest")
    assert(man.count() == n)
    val full = Tables.footerStatsTyped(spark, dir, Seq("x"))
      .orderBy("path").collect().map(_.toSeq)
    assert(man.orderBy("path").collect().map(_.toSeq).toSeq
      == full.toSeq)
    // a column the manifest was not built with raises
    intercept[IllegalArgumentException] {
      Tables.refreshManifest(spark, dir, Seq("x", "nope"))
    }
  }

  test("overlapDepth: disjoint files score 0, interleaved count each " +
    "other, NULL bounds overlap everything") {
    import graft.operators.Layout
    def stats(rows: Seq[(String, Any, Any)]) =
      rows.map { case (p, lo, hi) =>
        (p, Option(lo).map(_.asInstanceOf[Long].longValue()),
          Option(hi).map(_.asInstanceOf[Long].longValue()))
      }.toDF("path", "x_min", "x_max")
    val disjoint = stats(Seq(("a", 0L, 9L), ("b", 10L, 19L),
      ("c", 20L, 29L)))
    val d = Layout.overlapDepth(disjoint, "x").head()
    assert(d.getLong(0) == 3L && d.getLong(2) == 0L && d.getLong(3) == 0L)
    val inter = stats(Seq(("a", 0L, 20L), ("b", 10L, 30L),
      ("c", 15L, 25L)))
    val i = Layout.overlapDepth(inter, "x").head()
    assert(i.getLong(2) == 6L && i.getLong(3) == 2L
      && i.getDouble(4) == 2.0)
    // a NULL-bounded file overlaps (and is overlapped by) everything
    val withNull = stats(Seq(("a", 0L, 9L), ("b", 20L, 29L),
      ("n", null, null)))
    val w = Layout.overlapDepth(withNull, "x").head()
    assert(w.getLong(1) == 2L && w.getLong(2) == 4L && w.getLong(3) == 2L)
  }

  test("hoeffdingD: perfect monotone scores exactly 1; hand-computed " +
    "tied-U fixture parts; NULL below n = 5") {
    import graft.operators.RankStats
    val mono = (1L to 5L).map(i => ("a", i, i)).toDF("k", "x", "y")
    val m = RankStats.hoeffdingD(mono, "k", "x", "y").head()
    assert(m.getLong(1) == 5L && m.getDouble(4) == 1.0)
    // U-shape with y-ties: hand-computed doubled/quadrupled parts
    // (Q4 = 4,4,4,10,18; R2 = 2,4,6,8,10; S2 = 9,5,2,5,9)
    // d1_16 = 152, d3_16 = 444, num16 = 6*152 + 1752 - 6*444 = 0
    val u = Seq(("a", 1L, 4L), ("a", 2L, 1L), ("a", 3L, 0L),
      ("a", 4L, 1L), ("a", 5L, 4L)).toDF("k", "x", "y")
    val r = RankStats.hoeffdingD(u, "k", "x", "y").head()
    assert(r.getLong(2) == 152L && r.getLong(3) == 444L)
    assert(r.getDouble(4) == 0.0)
    // n = 4: exact parts still emitted, D NULL
    val four = (1L to 4L).map(i => ("a", i, i)).toDF("k", "x", "y")
    assert(RankStats.hoeffdingD(four, "k", "x", "y").head().isNullAt(4))
  }

  test("quadeParts: hand-computed weighted-block fixture, zero-range " +
    "block contributes nothing, ragged raise") {
    import graft.operators.RankStats
    // ranges 200,200,0 -> q2 = 5,5,2; r2 = (2,4),(2,4),(3,3);
    // S4: (-5,5),(-5,5),(0,0) -> A16=100, Sj4=(-10,10), B16=200,
    // F = 2*200/(3*100-200) = 4
    val df = Seq(("b1", "t1", 1.0), ("b1", "t2", 3.0),
      ("b2", "t1", 2.0), ("b2", "t2", 4.0),
      ("b3", "t1", 5.0), ("b3", "t2", 5.0)).toDF("b", "t", "v")
    val r = RankStats.quadeParts(df, "b", "t", "v")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))))
      .toMap
    assert(r("t1") == ((3L, 2L, -10L, 4.0)))
    assert(r("t2") == ((3L, 2L, 10L, 4.0)))
    val ragged = Seq(("b1", "t1", 1.0), ("b2", "t1", 1.0),
      ("b2", "t2", 2.0)).toDF("b", "t", "v")
    val e = intercept[Exception] {
      RankStats.quadeParts(ragged, "b", "t", "v").collect()
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("dunnTest: two clean groups reproduce the textbook z chain") {
    import graft.operators.RankStats
    val df = Seq(("all", "a", 1.0), ("all", "a", 2.0),
      ("all", "b", 3.0), ("all", "b", 4.0)).toDF("k", "g", "v")
    val r = RankStats.dunnTest(df, "k", "g", "v").head()
    assert(r.getString(1) == "a" && r.getString(2) == "b")
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)
    val vr = (4.0 * (4.0 + 1.0) - 0.0 / (4.0 - 1.0)) / 12.0
    val z = (6.0 / (2.0 * 2.0) - 14.0 / (2.0 * 2.0)) /
      math.sqrt(vr * (1.0 / 2.0 + 1.0 / 2.0))
    assert(r.getDouble(5) == z)
  }

  test("brownForsythe: hand-floored cent² terms, F = 4 on the " +
    "spread-vs-constant fixture") {
    import graft.operators.Robust
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    // a: med 2, z = (100,0,100) -> term = 40000 div 3 = 13333
    // b: z = 0 -> term 0; grand = 40000 div 6 = 6666
    // ssb = 6667, ssw = 6667, F = 4*6667/6667 = 4
    val r = Robust.brownForsythe(df, "g", "v").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 6667L && r.getLong(3) == 6667L)
    assert(r.getDouble(4) == 4.0)
  }

  test("changePointMeanShift: level shift found at the true split, " +
    "exact side sums, duplicate x raises") {
    import graft.operators.Timeseries
    // 1,1,1,5,5 -> g_floor peaks at k=3 (hand: 960000 vs 160000/
    // 426666/360000)
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 1.0), ("k", 3L, 1.0),
      ("k", 4L, 5.0), ("k", 5L, 5.0)).toDF("g", "x", "v")
    val r = Timeseries.changePointMeanShift(df, "g", "x", "v").head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 3L && r.getLong(4) == 300L)
    assert(r.getLong(5) == 2L && r.getLong(6) == 1000L)
    assert(r.getLong(7) == 960000L)
    val dup = Seq(("k", 1L, 1.0), ("k", 1L, 2.0)).toDF("g", "x", "v")
    val e = intercept[Exception] {
      Timeseries.changePointMeanShift(dup, "g", "x", "v").collect()
    }
    assert(e.getMessage.contains("duplicate x"))
    // n = 1: no interior split, key dropped
    val one = Seq(("k", 1L, 1.0)).toDF("g", "x", "v")
    assert(Timeseries.changePointMeanShift(one, "g", "x", "v")
      .count() == 0)
  }

  test("cramerVonMises: hand-ranked fixture, identical samples score " +
    "exactly 0") {
    import graft.operators.RankStats
    // X={1,2}, Y={3}: rd=2,4,6; ida=2,4; idb=2 -> U4 = 1*(6-2)^2 = 16
    val df = Seq(("k", 1.0, true), ("k", 2.0, true), ("k", 3.0, false))
      .toDF("g", "v", "a")
    val r = RankStats.cramerVonMises(df, "g", "v", col("a")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L && r.getLong(3) == 16L)
    val expT = 16.0 / (4.0 * 2.0 * 1.0 * (2.0 + 1.0)) -
      (4.0 * 2.0 * 1.0 - 1.0) / (6.0 * (2.0 + 1.0))
    assert(r.getDouble(4) == expT)
    // identical (fully tied) samples: midranks align, T = 0 exactly
    val same = Seq(("k", 1.0, true), ("k", 1.0, false)).toDF("g", "v", "a")
    val s2 = RankStats.cramerVonMises(same, "g", "v", col("a")).head()
    assert(s2.getLong(3) == 2L && s2.getDouble(4) == 0.0)
  }

  test("trimmedMean: rank-window overlap drops exactly k each side, " +
    "tied cells split correctly, over-trim NULLs") {
    import graft.operators.Robust
    // n=5, alpha=1/5 -> k=1: drop min and max, keep 2,3,4 -> mean 3
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0)).toDF("k", "v")
    val r = Robust.trimmedMean(df, "k", "v", 1, 5).head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L
      && r.getLong(3) == 900L && r.getDouble(4) == 3.0)
    // a tied cell straddling the trim boundary contributes only its
    // in-window rows: values 1,1,1,2 with k=1 keeps ranks 2..3 = two 1s
    val tied = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0))
      .toDF("k", "v")
    val t2 = Robust.trimmedMean(tied, "k", "v", 1, 4).head()
    assert(t2.getLong(2) == 2L && t2.getLong(3) == 200L
      && t2.getDouble(4) == 1.0)
    // alpha guard
    intercept[IllegalArgumentException] {
      Robust.trimmedMean(df, "k", "v", 1, 2)
    }
  }

  test("jarqueBera: derived from the same moment chains — uniform " +
    "3-point fixture gives JB = n/6 * (0 + 1.5^2/4)") {
    import graft.operators.Robust
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val r = Robust.jarqueBera(df, "k", "v").head()
    val jb = 3.0 / 6.0 * (0.0 * 0.0 + (-1.5) * (-1.5) / 4.0)
    assert(r.getDouble(7) == jb)
  }

  test("partialCorrelation: replicated exact-moment chains; collinear " +
    "predictor NULLs the partial") {
    import graft.operators.Robust
    val rows = Seq((1.0, 11.0, 1.0), (2.0, 2.0, 0.0), (3.0, 13.0, 1.0),
      (4.0, 4.0, 0.0))
    val df = rows.map { case (x, y, z) => ("k", x, y, z) }
      .toDF("k", "x", "y", "z")
    val r = Robust.partialCorrelation(df, "k", "x", "y", "z").head()
    // replicate the exact integer moments + the identical double chains
    val cs = rows.map { case (x, y, z) =>
      ((x * 100).toLong, (y * 100).toLong, (z * 100).toLong) }
    val n = cs.size.toLong
    def s(f: ((Long, Long, Long)) => Long) = cs.map(f).sum
    val (sx, sy, sz) = (s(_._1), s(_._2), s(_._3))
    val (sxx, syy, szz) = (s(c => c._1 * c._1), s(c => c._2 * c._2),
      s(c => c._3 * c._3))
    val (sxy, sxz, syz) = (s(c => c._1 * c._2), s(c => c._1 * c._3),
      s(c => c._2 * c._3))
    def pr(sab: Long, sa: Long, sb: Long, saa: Long, sbb: Long) =
      (n * sab - sa * sb).toDouble /
        (math.sqrt((n * saa - sa * sa).toDouble) *
          math.sqrt((n * sbb - sb * sb).toDouble))
    val (rxy, rxz, ryz) = (pr(sxy, sx, sy, sxx, syy),
      pr(sxz, sx, sz, sxx, szz), pr(syz, sy, sz, syy, szz))
    assert(r.getLong(1) == n && r.getDouble(2) == rxy
      && r.getDouble(3) == rxz && r.getDouble(4) == ryz)
    val part = (rxy - rxz * ryz) /
      (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz))
    val r2 = (rxy * rxy + ryz * ryz - 2.0 * rxy * rxz * ryz) /
      (1.0 - rxz * rxz)
    assert(r.getDouble(5) == part && r.getDouble(6) == r2)
    // x ≡ z with a PERFECT-SQUARE deviation (d = 4, sqrt exact) so
    // r_xz lands on exactly 1.0 and the partial's denominator
    // vanishes -> NULL (a non-square d leaves r_xz 1∓ulp and the
    // partial merely explodes — floats, not a bug)
    val col3 = Seq(("k", 0.00, 1.0, 0.00), ("k", 0.02, 3.0, 0.02))
      .toDF("k", "x", "y", "z")
    assert(Robust.partialCorrelation(col3, "k", "x", "y", "z")
      .head().isNullAt(5))
  }

  test("wilsonCI: replicated chain, extreme proportions stay in [0,1] " +
    "with nonzero width") {
    import graft.operators.Robust
    val df = Seq(("a", true), ("a", false), ("a", false), ("a", false),
      ("b", true), ("b", true), ("b", true),
      ("c", false), ("c", false)).toDF("k", "ok")
    val got = Robust.wilsonCI(df, "k", "ok").collect()
      .map(r => r.getString(0) -> r).toMap
    val z = 1.959963984540054
    val (n, s) = (4.0, 1.0)
    val p = s / n; val z2 = z * z
    val denom = 1.0 + z2 / n
    val center = (p + z2 / (2.0 * n)) / denom
    val half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
    val a = got("a")
    assert(a.getLong(1) == 4L && a.getLong(2) == 1L
      && a.getDouble(3) == p)
    assert(a.getDouble(4) == math.max(0.0, center - half)
      && a.getDouble(5) == math.min(1.0, center + half))
    // p̂ = 1: Wald width would be 0; Wilson still opens downward
    val b = got("b")
    assert(b.getDouble(3) == 1.0 && b.getDouble(4) < 1.0
      && b.getDouble(5) == 1.0)
    // p̂ = 0: opens upward, floor at 0
    val c = got("c")
    assert(c.getDouble(3) == 0.0 && c.getDouble(4) == 0.0
      && c.getDouble(5) > 0.0)
  }

  test("andersonDarlingK: k = 2 reproduces andersonDarling2's sums and " +
    "statistic exactly; 3 groups fold to one A2") {
    import graft.operators.RankStats
    val df2 = Seq(("k", 1.0, "a"), ("k", 2.0, "b"), ("k", 3.0, "a"),
      ("k", 4.0, "b")).toDF("g", "v", "grp")
    val parts = RankStats.andersonDarlingK(df2, "g", "grp", "v")
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // the q397-spec fixture: floored sums 2 and 2, A2 = 0.5
    assert(parts("a")._2 == 2L && parts("b")._2 == 2L)
    assert(parts("a")._3 + parts("b")._3 == 0.5)
    val ad2 = RankStats.andersonDarling2(
      df2.withColumn("isa", col("grp") === "a"), "g", "v", col("isa"))
      .head()
    assert(ad2.getLong(3) == parts("a")._2
      && ad2.getLong(4) == parts("b")._2)
    // 3 groups: contributions present for every group, each n_i right
    val df3 = Seq(("k", 1.0, "a"), ("k", 2.0, "b"), ("k", 3.0, "c"),
      ("k", 4.0, "a")).toDF("g", "v", "grp")
    val p3 = RankStats.andersonDarlingK(df3, "g", "grp", "v")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(p3 == Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }

  test("ansariBradley: tails-vs-middle fixture — hand scores, exact " +
    "finite-population moments, spread side scores negative z") {
    import graft.operators.RankStats
    // A = {1,4} (tails), B = {2,3} (middle): s2 = (2,4,4,2),
    // W2 = 4, S2 = 12, SS2 = 40 -> E = 6, Var = 4/3
    val df = Seq(("k", 1.0, true), ("k", 2.0, false), ("k", 3.0, false),
      ("k", 4.0, true)).toDF("g", "v", "a")
    val r = RankStats.ansariBradley(df, "g", "v", col("a")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 4L && r.getLong(4) == 12L
      && r.getLong(5) == 40L)
    val z = (4.0 - 2.0 * 12.0 / 4.0) /
      math.sqrt(2.0 * 2.0 * (4.0 * 40.0 - 12.0 * 12.0) /
        (4.0 * 4.0 * (4.0 - 1.0)))
    assert(r.getDouble(6) == z && z < 0.0)
    // fully tied pooled sample: every score equal -> Var 0 -> NULL z
    val tied = Seq(("k", 1.0, true), ("k", 1.0, false)).toDF("g", "v", "a")
    assert(RankStats.ansariBradley(tied, "g", "v", col("a"))
      .head().isNullAt(6))
  }

  test("conoverSquaredRanks: quadrupled centered scores on the AB " +
    "fixture — spread side scores POSITIVE z (opposite AB)") {
    import graft.operators.RankStats
    // s4 = (rd-5)^2 = (9,1,1,9): W4 = 18, S4 = 20, SS4 = 164
    val df = Seq(("k", 1.0, true), ("k", 2.0, false), ("k", 3.0, false),
      ("k", 4.0, true)).toDF("g", "v", "a")
    val r = RankStats.conoverSquaredRanks(df, "g", "v", col("a")).head()
    assert(r.getLong(3) == 18L && r.getLong(4) == 20L
      && r.getDouble(5) == 164.0)
    val z = (18.0 - 2.0 * 20.0 / 4.0) /
      math.sqrt(2.0 * 2.0 * (4.0 * 164.0 - 20.0 * 20.0) /
        (4.0 * 4.0 * (4.0 - 1.0)))
    assert(r.getDouble(6) == z && z > 0.0)
  }

  test("andersonDarling2: hand-floored interleaved fixture, identical " +
    "samples score 0, endpoint term drops") {
    import graft.operators.RankStats
    // X={1,3}, Y={2,4}: floored terms (1,0,1) per side -> sums 2,2,
    // A2 = (2/2 + 2/2)/4 = 0.5
    val df = Seq(("k", 1.0, true), ("k", 2.0, false), ("k", 3.0, true),
      ("k", 4.0, false)).toDF("g", "v", "a")
    val r = RankStats.andersonDarling2(df, "g", "v", col("a")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == 0.5)
    // fully tied identical samples: only the B = N endpoint exists
    // per value... the single shared value IS the endpoint -> sums 0
    val same = Seq(("k", 1.0, true), ("k", 1.0, false)).toDF("g", "v", "a")
    val s2 = RankStats.andersonDarling2(same, "g", "v", col("a")).head()
    assert(s2.getLong(3) == 0L && s2.getLong(4) == 0L
      && s2.getDouble(5) == 0.0)
  }

  test("energyDistance: exact cent pair sums from the prefix identity, " +
    "identical samples score 0") {
    import graft.operators.RankStats
    val df = Seq(("k", 0.0, true), ("k", 2.0, false)).toDF("g", "v", "a")
    val r = RankStats.energyDistance(df, "g", "v", col("a")).head()
    assert(r.getLong(3) == 200L && r.getLong(4) == 0L
      && r.getLong(5) == 0L)
    assert(r.getDouble(6) == 400.0)
    val same = Seq(("k", 0.0, true), ("k", 2.0, true),
      ("k", 0.0, false), ("k", 2.0, false)).toDF("g", "v", "a")
    val s2 = RankStats.energyDistance(same, "g", "v", col("a")).head()
    assert(s2.getLong(3) == 400L && s2.getLong(4) == 200L
      && s2.getLong(5) == 200L && s2.getDouble(6) == 0.0)
  }

  test("momentsByKey: uniform 3-point fixture — exact partials, skew 0, " +
    "excess kurtosis -1.5; constant key NULLs") {
    import graft.operators.Robust
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val r = Robust.momentsByKey(df, "k", "v").head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 600L
      && r.getLong(3) == 140000L && r.getLong(4) == 36000000L)
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == -1.5)
    val const = Seq(("a", 5.0), ("a", 5.0)).toDF("k", "v")
    val c = Robust.momentsByKey(const, "k", "v").head()
    assert(c.isNullAt(5) && c.isNullAt(6))
  }

  test("benfordTest: one-of-each-digit fixture — exact counts, replicated " +
    "chi2 chain, zero excluded, negative takes its abs digit") {
    import graft.operators.Robust
    val df = ((1 to 9).map(_.toDouble) ++ Seq(0.0)).toDF("v")
    val rows = Robust.benfordTest(df, "v").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows.size == 9 && rows.values.forall(_.getLong(5) == 9L))
    assert(rows.values.forall(_.getLong(1) == 1L))
    val p = Robust.benfordProbs
    (1 to 9).foreach { d =>
      assert(rows(d).getDouble(2) == 9.0 * p(d - 1))
      val e = 9.0 * p(d - 1)
      assert(rows(d).getDouble(3) == (1.0 - e) * (1.0 - e) / e)
    }
    val chi2 = (1 to 9).map { d =>
      val e = 9.0 * p(d - 1); (1.0 - e) * (1.0 - e) / e
    }.reduceLeft(_ + _)
    assert(rows(1).getDouble(4) == chi2)
    // negative value contributes its |cents| leading digit
    val neg = Seq(-2.5).toDF("v")
    assert(Robust.benfordTest(neg, "v")
      .filter(col("digit") === 2 && col("n_obs") === 1L).count() == 1)
  }

  test("vocabGrowth: first-occurrence counts at checkpoints") {
    import graft.llmdata.TextAnalysis
    val docs = Seq((1L, "a b"), (2L, "b c"), (4L, "a d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text",
      Seq(1L, 2L, 4L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L) == ((1L, 2L, 2L)))
    assert(got(2L) == ((2L, 4L, 3L)))
    assert(got(4L) == ((3L, 7L, 5L)))
  }

  test("Bloom: no false negatives, word-boundary bits, fold idempotent, " +
    "absent words zero") {
    import graft.functions.Bloom
    val members = (0 until 50).map(i => s"doc-$i").toDF("item")
    // mBits = 64: every position lands in word 0 including bit 63 —
    // the sign-bit edge of the shiftleft/bitwiseAND path
    val tiny = Bloom.partial(members, "item", 64L, 4)
    assert(tiny.count() == 1 && tiny.head().getLong(0) == 0L)
    val f = Bloom.partial(members, "item", 1024L, 4)
    val probes = ((0 until 50).map(i => s"doc-$i")
      ++ (0 until 50).map(i => s"ghost-$i")).toDF("item")
    val got = Bloom.contains(f, probes, "item", 1024L, 4)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // zero false negatives
    assert((0 until 50).forall(i => got(s"doc-$i")))
    // at 50*4/1024 fill the ghosts are mostly rejected (FP ~ 2%)
    assert((0 until 50).count(i => got(s"ghost-$i")) < 10)
    // fold of slices (one replayed) ≡ one-shot, bitwise
    val s0 = Bloom.partial(members.filter(length(col("item")) === 5),
      "item", 1024L, 4)
    val s1 = Bloom.partial(members.filter(length(col("item")) =!= 5),
      "item", 1024L, 4)
    val folded = Bloom.merge(Seq(Bloom.merge(Seq(s0, s1)), s1))
    assert(folded.join(f.withColumnRenamed("bits", "b2"), Seq("word_idx"),
      "full").filter(!(col("bits") <=> col("b2"))).count() == 0)
    // param guards
    intercept[IllegalArgumentException] {
      Bloom.partial(members, "item", 100L, 4)
    }
    intercept[IllegalArgumentException] {
      Bloom.partial(members, "item", 1024L, 0)
    }
  }

  test("ljungBox: alternating series — hand-computed exact lag products " +
    "and the replicated Q chain") {
    import graft.operators.Timeseries
    // y = 1,3,1,3,1,3 -> v cents alternate 100/300, s = 1200,
    // e = 6v - 1200 = ∓600 alternating; den = 6*360000
    val df = (1L to 6L).map(i => ("k", i, if (i % 2 == 1) 1.0 else 3.0))
      .toDF("g", "x", "v")
    val rows = Timeseries.ljungBox(df, "g", "x", "v", 3)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(rows(1)._2 == -1800000L && rows(2)._2 == 1440000L
      && rows(3)._2 == -1080000L)
    assert(rows(1)._3 == 2160000L && rows(1)._1 == 6L)
    val (r1, r2, r3) = (-1800000.0 / 2160000.0, 1440000.0 / 2160000.0,
      -1080000.0 / 2160000.0)
    val q = 6.0 * (6.0 + 2.0) *
      (r1 * r1 / 5.0 + r2 * r2 / 4.0 + r3 * r3 / 3.0)
    assert(rows(1)._5 == q && rows(2)._5 == q && rows(3)._5 == q)
    assert(rows(1)._4 == r1 && rows(2)._4 == r2 && rows(3)._4 == r3)
    // n <= maxLag: exact parts still emitted, Q NULL
    val short = (1L to 3L).map(i => ("k", i, i.toDouble)).toDF("g", "x", "v")
    assert(Timeseries.ljungBox(short, "g", "x", "v", 3)
      .filter(col("q_stat").isNotNull).count() == 0)
    // duplicate x raises (the DW contract)
    val dup = Seq(("k", 1L, 1.0), ("k", 1L, 2.0)).toDF("g", "x", "v")
    val e = intercept[Exception] {
      Timeseries.ljungBox(dup, "g", "x", "v", 2).collect()
    }
    assert(e.getMessage.contains("duplicate x"))
  }

  test("moodMedian: perfect 2-group split scores chi2 = n, " +
    "median from the exact lattice rule") {
    import graft.operators.Robust
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0),
      ("b", 5.0)).toDF("g", "v")
    val r = Robust.moodMedian(df, "g", "v").head()
    // median = min v with 2*cum >= 5 -> 3.0; A all at_or_below,
    // B all above -> perfect association: chi2_micro = 5e6, V = 1
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 5000000L && r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 3.0)
  }
}
