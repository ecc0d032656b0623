package graft

import org.apache.spark.sql.functions._

/** Round-12 hardening + operators: Unique NULL-key exemption,
  * snapshot-transactional compaction (compact/expire/vacuum),
  * batch-id-keyed snapshot commits, upsert commit ordering +
  * half-commit detection, LSH hot-bucket star guard, surrogate-pair
  * partition values, readPrunedPartitioned bound-type validation, and
  * the AbsRangeRewrite MinValue contract. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // Unique: dbt NULL-key semantics
  // ---------------------------------------------------------------

  test("Unique exempts NULL keys: two NULL-keyed rows pass, duplicated " +
    "non-null keys fail with NULLs out of the denominator") {
    import graft.checks._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "c"), (null, "d"))
      .toDF("k", "v")
    val ok = new CheckSuite(Seq(Unique(Seq("k")))).run(df)
    assert(ok.head.passed, "NULL keys must be exempt (dbt contract)")
    assert(ok.head.unexpectedPercent == 0.0)

    val dup = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "b"), (2L, "c"), (null, "d"), (null, "e"))
      .toDF("k", "v")
    val bad = new CheckSuite(Seq(Unique(Seq("k")))).run(dup)
    assert(!bad.head.passed)
    // 3 non-null rows, 2 distinct -> 1 bad over den 3
    assert(math.abs(bad.head.unexpectedPercent - 100.0 / 3.0) < 1e-12)
  }

  test("Unique multi-column: any-NULL tuples are exempt (the " +
    "COUNT DISTINCT convention)") {
    import graft.checks._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L), (1L, 2L), (1L, null), (1L, null), (null, 5L), (null, 5L))
      .toDF("a", "b")
    val r = new CheckSuite(Seq(Unique(Seq("a", "b")))).run(df)
    assert(r.head.passed,
      "tuples with a NULL component must not count as duplicates")
    val dup = df.union(Seq[(java.lang.Long, java.lang.Long)]((1L, 2L))
      .toDF("a", "b"))
    val r2 = new CheckSuite(Seq(Unique(Seq("a", "b")))).run(dup)
    assert(!r2.head.passed, "a duplicated fully-non-null tuple still fails")
  }

  // ---------------------------------------------------------------
  // Snapshots: commitAt / compact / expire / vacuum
  // ---------------------------------------------------------------

  test("commitAt is replay-stable and raises off the frontier") {
    import graft.incremental.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft-commitat")
      .toString + "/lake"
    (1 to 10).toDF("x").coalesce(1).write.parquet(s"$root/batch-0")
    Snapshots.commitAt(spark, root, 1L)
    (11 to 20).toDF("x").coalesce(1).write.parquet(s"$root/batch-1")
    Snapshots.commitAt(spark, root, 2L)
    // replay of batch 1: overwrite dir, re-commit SAME version
    (11 to 20).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/batch-1")
    Snapshots.commitAt(spark, root, 2L)
    val vs = Snapshots.versions(spark, root)
      .select("version").collect().map(_.getLong(0)).toSeq.sorted
    assert(vs == Seq(1L, 2L), s"replay appended a version: $vs")
    assert(Snapshots.readVersion(spark, root, 2L).count() == 20L)
    assert(Snapshots.unreferencedFiles(spark, root).isEmpty,
      "the re-pinned v2 must reference the replayed files, no danglers")
    // out-of-order commit raises
    intercept[IllegalArgumentException] {
      Snapshots.commitAt(spark, root, 1L)
    }
  }

  test("compact commits the rewrite as one atomic version; time travel " +
    "crosses it; expire+vacuum reclaim exactly the superseded files") {
    import graft.incremental.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft-snapcomp")
      .toString + "/lake"
    (1 to 400).toDF("x").repartition(8).write.parquet(root)
    assert(Snapshots.commit(spark, root) == 1L)
    (401 to 800).toDF("x").repartition(8)
      .write.mode("append").parquet(root)
    assert(Snapshots.commit(spark, root) == 2L)
    val preSum = Snapshots.readVersion(spark, root, 2L)
      .agg(sum("x")).head.getLong(0)
    val v3 = Snapshots.compact(spark, root, Long.MaxValue / 4)
    assert(v3 == 3L)
    // asOf(2) bit-stable across the rewrite, and still 16 files
    assert(Snapshots.readVersion(spark, root, 2L)
      .agg(sum("x")).head.getLong(0) == preSum)
    assert(Snapshots.readVersion(spark, root, 2L).inputFiles.length == 16)
    // one giant target -> one group -> one file, same content
    assert(Snapshots.readVersion(spark, root, 3L).inputFiles.length == 1)
    assert(Snapshots.readVersion(spark, root, 3L)
      .agg(sum("x")).head.getLong(0) == preSum)
    // vacuum is a no-op while history pins the originals
    assert(Snapshots.vacuum(spark, root).isEmpty)
    // plain commit AFTER compaction never re-pins superseded files
    (801 to 900).toDF("x").coalesce(1)
      .write.mode("append").parquet(s"$root/batch-2")
    val v4 = Snapshots.commit(spark, root)
    assert(v4 == 4L)
    assert(Snapshots.readVersion(spark, root, 4L).count() == 900L,
      "post-compaction commit must pin compacted + appended, not originals")
    assert(Snapshots.readVersion(spark, root, 4L).inputFiles.length == 2)
    // expire history, sweep: exactly the 16 superseded originals go
    assert(Snapshots.expire(spark, root, keepLast = 2) == Seq(1L, 2L))
    val swept = Snapshots.vacuum(spark, root)
    assert(swept.size == 16 && !swept.exists(_.contains("compact-v")))
    assert(Snapshots.readLatest(spark, root).count() == 900L)
    assert(Snapshots.readVersion(spark, root, 3L)
      .agg(sum("x")).head.getLong(0) == preSum)
  }

  test("compactClustered: range-cut sorted rewrite commits atomically " +
    "and tightens footer bounds to disjoint ranges") {
    import graft.incremental.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft-cluscomp")
      .toString + "/lake"
    // interleaved writes: every file spans the whole key range
    (1 to 800).filter(_ % 2 == 0).toDF("x").repartition(4)
      .write.parquet(root)
    Snapshots.commit(spark, root)
    (1 to 800).filter(_ % 2 == 1).toDF("x").repartition(4)
      .write.mode("append").parquet(root)
    Snapshots.commit(spark, root)
    val v3 = Snapshots.compactClustered(spark, root, nFiles = 4, Seq("x"))
    assert(v3 == 3L)
    val post = Snapshots.readVersion(spark, root, 3L)
    assert(post.count() == 800L && post.agg(sum("x")).head.getLong(0)
      == 800L * 801 / 2)
    // disjoint bounds: a one-quarter box opens exactly one file
    val cand = graft.sources.Tables.prunedCandidateFiles(spark,
      s"$root/compact-v3", Seq(("x", 1L, 200L)))
    assert(cand.length == 1, s"expected 1 candidate file, got ${cand.length}")
    // raises on an unlogged lake like its siblings
    val plain = java.nio.file.Files.createTempDirectory("graft-cc2")
      .toString + "/t"
    (1 to 5).toDF("x").write.parquet(plain)
    intercept[IllegalArgumentException] {
      Snapshots.compactClustered(spark, plain, 2, Seq("x"))
    }
  }

  test("bpeFertility: chars are conserved across merges and tokens " +
    "shrink by exactly the applied merge count") {
    import graft.llmdata.TextAnalysis
    val docs = Seq(
      (1L, "en", "aaab aaab cc"),
      (2L, "en", "aaab cc cc"),
      (3L, "de", "bbbb aaab")).toDF("doc_id", "lang", "text")
    val f = TextAnalysis.bpeFertility(docs, "text", "lang", nMerges = 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // merges learned on this corpus: round 1 (a,a)=8 beats all;
    // round 2 ties (aa,a)=4 vs (a,b)=4 and "a b" < "aa a" wins the
    // pair-string-asc tie-break -> ("a","b")
    val merges = TextAnalysis.bpeTrain(docs, "doc_id", "text", 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
    // aaab: [a,a,a,b] -(a,a)-> [aa,a,b] -(a,b)-> [aa,ab] = 2 tokens
    assert(f.toSeq == Seq(
      ("de", 2L, 6L, 8L),   // bbbb=4 toks 4 chars; aaab=2 toks 4 chars
      ("en", 6L, 12L, 18L)))// 3*aaab(2 toks,4ch) + 3*cc(2 toks,2ch)
    // chars conserved: n_chars equals the raw word-length sum
    val raw = docs.select(explode(split(trim(lower(col("text"))), "\\s+"))
      .as("w")).filter(length(col("w")) > 0)
      .agg(sum(length(col("w")))).head.getLong(0)
    assert(f.map(_._4).sum == raw)
  }

  test("vacuum refuses an unlogged lake; compact refuses one too") {
    import graft.incremental.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft-unlogged")
      .toString + "/lake"
    (1 to 5).toDF("x").write.parquet(root)
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, root)
    }
    intercept[IllegalArgumentException] {
      Snapshots.compact(spark, root, 1024L)
    }
  }

  test("rollback restores the pre-version state exactly: exclusive " +
    "files go, shared and uncommitted files survive") {
    import graft.incremental.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft-rollback")
      .toString + "/lake"
    (1 to 10).toDF("x").coalesce(1).write.parquet(s"$root/batch-0")
    Snapshots.commitAt(spark, root, 1L)
    (11 to 20).toDF("x").coalesce(1).write.parquet(s"$root/batch-1")
    Snapshots.commitAt(spark, root, 2L)
    // stage an UNCOMMITTED batch too — rollback must not touch it
    (21 to 30).toDF("x").coalesce(1).write.parquet(s"$root/batch-2")
    assert(Snapshots.rollback(spark, root, 1L) == Seq(2L))
    // v2's exclusive files (batch-1) are gone; v1's and the staged
    // batch-2 survive
    assert(spark.read.parquet(s"$root/batch-0").count() == 10L)
    assert(spark.read.parquet(s"$root/batch-2").count() == 10L)
    intercept[Exception] { spark.read.parquet(s"$root/batch-1").count() }
    // the next commit sees exactly v1's files + the staged batch
    Snapshots.commitAt(spark, root, 2L)
    assert(Snapshots.readVersion(spark, root, 2L).count() == 20L)
    assert(Snapshots.rollback(spark, root, 5L).isEmpty) // no-op above
  }

  test("snapshotMaintainSink: ingest + periodic compaction, version " +
    "line a pure function of the batch id") {
    import graft.streaming.Streaming
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mainsink")
      .toString
    val lake = dir + "/lake"
    val in = MemoryStream[(Long, Long)]
    val q = Streaming.snapshotMaintainSink(in.toDF().toDF("x", "y"),
      lake, dir + "/ckpt", compactEvery = 2, targetBytes = Long.MaxValue / 4)
    try {
      in.addData((0L until 30L).map(i => (i, i % 3)): _*)
      q.processAllAvailable()
      in.addData((30L until 50L).map(i => (i, i % 3)): _*)
      q.processAllAvailable()
      in.addData((50L until 60L).map(i => (i, i % 3)): _*)
      q.processAllAvailable()
    } finally q.stop()
    import graft.incremental.Snapshots
    // b0 -> v1; b1 -> v2 + compact v3; b2 -> v4
    val vs = Snapshots.versions(spark, lake).select("version")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(vs == Seq(1L, 2L, 3L, 4L))
    assert(Snapshots.readVersion(spark, lake, 3L).count() == 50L)
    assert(Snapshots.readVersion(spark, lake, 3L).inputFiles.length == 1)
    assert(Snapshots.readVersion(spark, lake, 4L).count() == 60L)
    // compactAt guards: base version must exist, frontier enforced
    intercept[IllegalArgumentException] {
      Snapshots.compactAt(spark, lake, 9L, 1024L)
    }
    intercept[IllegalArgumentException] {
      Snapshots.compactAt(spark, lake, 3L, 1024L)
    }
  }

  test("maseParts: exact error sums by hand, seasonal beats naive on " +
    "a periodic series") {
    import graft.operators.Timeseries
    // period-2 alternation 10,20,10,20,... : seasonal lag-2 errors 0,
    // naive lag-1 errors all 10 -> mase 0
    val alt = (1 to 8).map(i =>
      ("k", i.toLong, if (i % 2 == 0) 20.0 else 10.0))
      .toDF("k", "x", "y")
    val r = Timeseries.maseParts(alt, "k", "x", "y", period = 2)
      .head()
    assert(r.getLong(r.fieldIndex("n")) == 8L)
    assert(r.getLong(r.fieldIndex("abs_err_seasonal")) == 0L)
    assert(r.getLong(r.fieldIndex("n_seasonal")) == 6L)
    assert(r.getLong(r.fieldIndex("abs_err_naive")) == 7L * 1000L)
    assert(r.getLong(r.fieldIndex("n_naive")) == 7L)
    assert(r.getDouble(r.fieldIndex("mase")) == 0.0)
    // constant series: naive MAE 0 -> mase NULL
    val const = (1 to 5).map(i => ("k", i.toLong, 3.0)).toDF("k", "x", "y")
    val cr = Timeseries.maseParts(const, "k", "x", "y", 2).head()
    assert(cr.isNullAt(cr.fieldIndex("mase")))
    // duplicate x raises
    intercept[Exception] {
      Timeseries.maseParts(alt.union(Seq(("k", 1L, 5.0)).toDF("k", "x", "y")),
        "k", "x", "y", 2).collect()
    }
  }

  test("ledger regressions: newly-failing flag, drift delta, and " +
    "single-run NULL prev columns") {
    import graft.checks._
    val dir = java.nio.file.Files.createTempDirectory("graft-ledreg")
      .toString + "/ledger"
    val led = new CheckLedger(spark, dir)
    val suite = new CheckSuite(Seq(NotNull("v", mostly = 0.5)))
    led.record("r1", "t", suite.run(
      Seq[java.lang.Long](1L, 2L, 3L, null).toDF("v")))     // 25% bad
    led.record("r2", "t", suite.run(
      Seq[java.lang.Long](1L, null, null, null).toDF("v"))) // 75% bad
    // a constraint seen only in the LAST run
    led.record("r2", "t2", suite.run(Seq[java.lang.Long](1L).toDF("v")))
    val r = led.regressions().get.orderBy("layer").collect()
    val t1 = r(0)
    assert(t1.getString(t1.fieldIndex("prev_run")) == "r1"
      && t1.getString(t1.fieldIndex("last_run")) == "r2")
    assert(t1.getDouble(t1.fieldIndex("prev_pct")) == 25.0
      && t1.getDouble(t1.fieldIndex("last_pct")) == 75.0
      && t1.getDouble(t1.fieldIndex("delta_pct")) == 50.0)
    assert(t1.getBoolean(t1.fieldIndex("newly_failing")),
      "passed at 25% under mostly=0.5, fails at 75% — must flag")
    val t2 = r(1)
    assert(t2.isNullAt(t2.fieldIndex("prev_run"))
      && t2.isNullAt(t2.fieldIndex("prev_pct"))
      && !t2.getBoolean(t2.fieldIndex("newly_failing")))
  }

  test("cusumParts: hand series — the cumulative centered residual " +
    "peaks at the level shift, first-position tie rule") {
    import graft.operators.Timeseries
    // level shift after t3: 1,1,1,5,5,5 -> mean 3; e_t = 6*v - 18
    // (cents: 600*v - 1800... v cents = 100,100,100,500,500,500)
    // e = {-1200,-1200,-1200,+1200,+1200,+1200}; S = -1200,-2400,
    // -3600,-2400,-1200,0 -> max|S| = 3600 at x=3 (the change point)
    val s = Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0).zipWithIndex
      .map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("k", "x", "v")
    val r = Timeseries.cusumParts(s, "k", "x", "v").head()
    assert(r.getLong(r.fieldIndex("max_abs_cusum")) == 3600L)
    assert(r.getLong(r.fieldIndex("argmax_x")) == 3L)
    assert(r.getLong(r.fieldIndex("n")) == 6L
      && r.getLong(r.fieldIndex("sum_cents")) == 1800L)
    // constant series: every S_t = 0, argmax = first x
    val c = Seq(("k", 1L, 2.0), ("k", 2L, 2.0)).toDF("k", "x", "v")
    val rc = Timeseries.cusumParts(c, "k", "x", "v").head()
    assert(rc.getLong(rc.fieldIndex("max_abs_cusum")) == 0L
      && rc.getLong(rc.fieldIndex("argmax_x")) == 1L)
  }

  test("pettittParts: the hand level-shift series peaks at the same " +
    "change point as CUSUM, exact U off the midrank lattice") {
    import graft.operators.RankStats
    // 1,1,1,5,5,5: midranks 2,2,2,5,5,5 (doubled 4,10); cumrd =
    // 4,8,12,22,32,42; U_t = cumrd - 7t = -3,-6,-9,-6,-3,0
    val s = Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0).zipWithIndex
      .map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("k", "x", "v")
    val r = RankStats.pettittParts(s, "k", "x", "v").head()
    assert(r.getLong(r.fieldIndex("max_abs_u")) == 9L)
    assert(r.getLong(r.fieldIndex("argmax_x")) == 3L)
    assert(r.getLong(r.fieldIndex("n")) == 6L)
    // an outlier that breaks value-CUSUM barely moves the rank U:
    // same series with 5 -> 5000 in one slot keeps the change point
    val o = Seq(1.0, 1.0, 1.0, 5.0, 5000.0, 5.0).zipWithIndex
      .map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("k", "x", "v")
    val ro = RankStats.pettittParts(o, "k", "x", "v").head()
    assert(ro.getLong(ro.fieldIndex("argmax_x")) == 3L
      && ro.getLong(ro.fieldIndex("max_abs_u")) == 9L)
  }

  test("bloomIndexRefresh indexes only new files and is idempotent") {
    import graft.sources.Tables
    val root = java.nio.file.Files.createTempDirectory("graft-bref")
      .toString + "/lake"
    (0L until 1000L).map(i => (i, i % 5)).toDF("id", "grp")
      .repartitionByRange(4, col("grp"), col("id")).write.parquet(root)
    Tables.bloomIndexWrite(spark, root, "id")
    (1000L until 1500L).map(i => (i, i % 5)).toDF("id", "grp")
      .repartition(2).write.mode("append").parquet(root)
    assert(Tables.bloomIndexRefresh(spark, root, "id") == 2)
    assert(Tables.bloomIndexRefresh(spark, root, "id") == 0)
    val hit = Tables.readBloomPruned(spark, root, "id", Seq(1499L))
    assert(hit.count() == 1L && hit.inputFiles.length <= 3)
  }

  test("croston: hand recursion — seed at first demand, interval " +
    "smoothing on the observed gaps, NULLs before the seed") {
    import graft.operators.Timeseries
    val s = Seq(("k", 1L, 0.0), ("k", 2L, 3.0), ("k", 3L, 0.0),
      ("k", 4L, 0.0), ("k", 5L, 5.0), ("k", 6L, 2.0))
      .toDF("k", "x", "demand")
    val r = Timeseries.croston(s, "k", "x", "demand", alpha = 0.5)
      .orderBy("x").collect()
    assert(r(0).isNullAt(r(0).fieldIndex("forecast")))
    // t2: first demand -> z=3, p = 2 periods since start
    assert(r(1).getDouble(r(1).fieldIndex("demand_level")) == 3.0
      && r(1).getDouble(r(1).fieldIndex("interval_level")) == 2.0
      && r(1).getDouble(r(1).fieldIndex("forecast")) == 1.5)
    // zero days carry the state
    assert(r(3).getDouble(r(3).fieldIndex("forecast")) == 1.5)
    // t5 after a 3-period gap: z = 5*.5+3*.5 = 4, p = 3*.5+2*.5 = 2.5
    assert(r(4).getDouble(r(4).fieldIndex("demand_level")) == 4.0
      && r(4).getDouble(r(4).fieldIndex("interval_level")) == 2.5
      && r(4).getDouble(r(4).fieldIndex("forecast")) == 1.6)
    // t6 immediately after: p = 1*.5+2.5*.5 = 1.75
    assert(r(5).getDouble(r(5).fieldIndex("demand_level")) == 3.0
      && r(5).getDouble(r(5).fieldIndex("interval_level")) == 1.75)
    intercept[Exception] {
      Timeseries.croston(Seq(("k", 1L, -1.0)).toDF("k", "x", "demand"),
        "k", "x", "demand", 0.5).collect()
    }
    intercept[IllegalArgumentException] {
      Timeseries.croston(s, "k", "x", "demand", alpha = 0.3)
    }
  }

  test("PairGreater: strict / or-equal / NULL-exempt semantics and " +
    "the JSON config round-trip") {
    import graft.checks._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (5.0, 1.0), (3.0, 3.0), (2.0, 4.0), (null, 9.0), (7.0, null))
      .toDF("a", "b")
    val rs = new CheckSuite(Seq(
      PairGreater("a", "b"),
      PairGreater("a", "b", orEqual = true),
      PairGreater("a", "b", mostly = 0.3))).run(df)
    // 3 comparable rows: strict passes 1/3 (bad 2), or-equal 2/3
    assert(!rs(0).passed
      && math.abs(rs(0).unexpectedPercent - 200.0 / 3.0) < 1e-12)
    assert(!rs(1).passed
      && math.abs(rs(1).unexpectedPercent - 100.0 / 3.0) < 1e-12)
    assert(rs(2).passed, "mostly=0.3 admits 1/3 passing")
    val parsed = CheckConfig.fromJson(spark,
      """[{"type": "pair_greater", "column_a": "a", "column_b": "b",
        |  "or_equal": true}]""".stripMargin).run(df)
    assert(parsed.head.constraint == "pair_greater(a,b,or_equal)"
      && math.abs(parsed.head.unexpectedPercent - 100.0 / 3.0) < 1e-12)
  }

  // ---------------------------------------------------------------
  // Deletes: commit ordering + half-commit detector
  // ---------------------------------------------------------------

  test("upsert detects a half-committed op (add dir without its delete " +
    "file) and upsertAt at that op repairs it") {
    import graft.incremental.Deletes
    val root = java.nio.file.Files.createTempDirectory("graft-halfop")
      .toString + "/lake"
    Deletes.initBase(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 1)
    Deletes.upsert(spark, root, Seq((2L, "b2")).toDF("id", "v"), Seq("id"))
    // simulate a crash between the add write and the delete write:
    // add-2 exists, d=2 does not
    Seq((1L, "a2")).toDF("id", "v").write.parquet(s"$root/add-2")
    val e = intercept[IllegalArgumentException] {
      Deletes.upsert(spark, root, Seq((3L, "c")).toDF("id", "v"), Seq("id"))
    }
    assert(e.getMessage.contains("half-committed"))
    // mid-window read shows BOTH versions of key 1 (duplicates, never
    // missing keys — the documented add-first ordering)
    val mid = Deletes.readMerged(spark, root)
      .filter(col("id") === 1L).count()
    assert(mid == 2L)
    // replaying the batch at the flagged op repairs
    Deletes.upsertAt(spark, root, Seq((1L, "a2")).toDF("id", "v"),
      Seq("id"), 2L)
    val fixed = Deletes.readMerged(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(fixed == Seq((1L, "a2"), (2L, "b2")))
    // and the next auto-op proceeds
    Deletes.upsert(spark, root, Seq((3L, "c")).toDF("id", "v"), Seq("id"))
    assert(Deletes.readMerged(spark, root).count() == 3L)
  }

  test("conoverParts: exact moments on a hand lattice, consistent " +
    "with kruskalWallis") {
    import graft.operators.RankStats
    // groups A=(1,2,2), B=(2,3): pooled sorted 1,2,2,2,3 ->
    // midranks 1, 3, 3, 3, 5 (doubled: 2, 6, 6, 6, 10)
    val df = Seq(("k", "A", 1.0), ("k", "A", 2.0), ("k", "A", 2.0),
      ("k", "B", 2.0), ("k", "B", 3.0)).toDF("key", "g", "v")
    val r = RankStats.conoverParts(df, "key", "g", "v").head()
    assert(r.getString(r.fieldIndex("g_a")) == "A"
      && r.getString(r.fieldIndex("g_b")) == "B")
    // rsumd_A = 2+6+6 = 14, rsumd_B = 6+10 = 16
    assert(r.getLong(r.fieldIndex("rsumd_a")) == 14L)
    assert(r.getLong(r.fieldIndex("rsumd_b")) == 16L)
    assert(r.getLong(r.fieldIndex("n_a")) == 3L
      && r.getLong(r.fieldIndex("n_b")) == 2L)
    // diff numerator = 14*2 - 16*3 = -20 (true mean-rank diff -20/12)
    assert(r.getLong(r.fieldIndex("diff_doubled_num")) == -20L)
    // sum_r2_quadrupled = 1*4 + 3*36 + 1*100 = 212 = 4*(1+9+9+9+25)
    assert(r.getLong(r.fieldIndex("sum_r2_quadrupled")) == 212L)
    // tie triple at v=2: 27-3 = 24
    assert(r.getLong(r.fieldIndex("tie_cubed_sum")) == 24L)
    assert(r.getLong(r.fieldIndex("n")) == 5L)
    // group moments agree with kruskalWallis's own emission
    val kw = RankStats.kruskalWallis(df, "key", "g", "v")
      .orderBy("g").collect()
    assert(kw.map(_.getLong(3)).toSeq == Seq(14L, 16L))
  }

  test("benfordCounts: exact digit extraction off the cents integer, " +
    "zero/negative/NULL excluded") {
    import graft.operators.Profile
    val df = Seq[java.lang.Double](12.34, 0.05, 923.0, 1.0, 0.0, -7.0,
      null, 0.19).toDF("v")
    val r = Profile.benfordCounts(df, "v").orderBy("digit").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq
    // digits: 12.34->1, 0.05->5, 923->9, 1.0->1, 0.19->1
    assert(r == Seq((1, 3L, 5L), (5, 1L, 5L), (9, 1L, 5L)))
  }

  // ---------------------------------------------------------------
  // MinHash LSH: hot-bucket star guard
  // ---------------------------------------------------------------

  test("minhashLsh hot-bucket cap: an all-identical corpus produces " +
    "O(n) star pairs instead of O(n^2), connectivity preserved") {
    import graft.llmdata.DedupOps
    val text = "the quick brown fox jumps over the lazy dog again"
    val docs = (1 to 60).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val capped = DedupOps.minhashLsh(docs, "doc_id", "text",
      maxBucketSize = 8).collect()
    // star topology: every doc pairs with the bucket min (doc 1)
    assert(capped.length == 59, s"expected 59 star pairs, got ${capped.length}")
    assert(capped.forall(_.getDouble(2) == 1.0))
    assert(capped.forall(_.getLong(0) == 1L),
      "every pair must anchor at the bucket-min keeper")
    // default cap (256): buckets below it keep the full quadratic
    // pair set (the contract q34 pins at its measured operating point)
    val full = DedupOps.minhashLsh(docs, "doc_id", "text")
    assert(full.count() == 60L * 59 / 2)
    // ...and a degenerate corpus LARGER than the default cap completes
    // in O(n) star pairs with no caller opt-in (round-13: the safe
    // default — a pipeline that skips exact-dedup-first must not get
    // a silent quadratic bucket)
    val big = (1 to 300).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val defaulted = DedupOps.minhashLsh(big, "doc_id", "text")
    assert(defaulted.count() == 299L,
      "default cap must star-collapse a 300-doc identical bucket")
    // explicit opt-out restores the quadratic set
    assert(DedupOps.minhashLsh(big, "doc_id", "text",
      maxBucketSize = Int.MaxValue).count() == 300L * 299 / 2)
    // mixed corpus: the cap must not disturb sparse buckets
    val mixed = docs.union(Seq((100L, "completely different words here"),
      (101L, "completely different words here")).toDF("doc_id", "text"))
    val pairs = DedupOps.minhashLsh(mixed, "doc_id", "text",
      maxBucketSize = 8)
    assert(pairs.filter(col("id_a") === 100L && col("id_b") === 101L)
      .count() == 1L, "the sparse-bucket pair must survive the cap")
  }

  // ---------------------------------------------------------------
  // IVF-PQ: ADC scan + exact rerank over the materialized index
  // ---------------------------------------------------------------

  test("ivfPqTopKIndexed with an unrestricted candidate budget equals " +
    "ivfTopKIndexed at equal probes; codes are one byte per subspace") {
    import graft.llmdata.Similarity
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq")
      .toString
    Similarity.ivfPqIndexWrite(emb, "vec_id", "embedding", s"$dir/pq",
      dim = 64, m = 8, kSub = 16, nCells = 8, lloydIters = 1, pqIters = 1)
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", s"$dir/flat",
      nCells = 8, lloydIters = 1)
    val queries = emb.filter(col("vec_id") < 8)
    val pq = Similarity.ivfPqTopKIndexed(spark, s"$dir/pq", queries,
      "vec_id", "embedding", k = 3, nprobe = 2,
      overfetch = Int.MaxValue / 3)
    val flat = Similarity.ivfTopKIndexed(spark, s"$dir/flat", queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
    // rerank over ALL probed vectors == the flat ranking, bit-exact
    assert(pq.exceptAll(flat).isEmpty && flat.exceptAll(pq).isEmpty)
    // the memory claim: m codes per vector, each in [0, kSub) — one
    // byte per subspace (8 bytes vs 64 dims * 8 = 512 full-precision)
    val codes = spark.read.parquet(s"$dir/pq/assigned")
    val shape = codes.agg(
      min(size(col("codes"))).as("mn"), max(size(col("codes"))).as("mx"),
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi")).head()
    assert(shape.getInt(0) == 8 && shape.getInt(1) == 8)
    assert(shape.getInt(2) >= 0 && shape.getInt(3) < 16)
    // a modest overfetch still returns k rows per query (recall may
    // dip, cardinality must not)
    val modest = Similarity.ivfPqTopKIndexed(spark, s"$dir/pq", queries,
      "vec_id", "embedding", k = 3, nprobe = 2, overfetch = 2)
    assert(modest.groupBy("query_id").count()
      .filter(col("count") =!= 3L).count() == 0)
    // RESIDUAL encoding (by_residual=true, resolved from path/meta):
    // same unrestricted-budget equality — the exact rerank is
    // encoding-independent, only the ADC candidate order differs
    Similarity.ivfPqIndexWrite(emb, "vec_id", "embedding", s"$dir/rpq",
      dim = 64, m = 8, kSub = 16, nCells = 8, lloydIters = 1,
      pqIters = 1, byResidual = true)
    val rpq = Similarity.ivfPqTopKIndexed(spark, s"$dir/rpq", queries,
      "vec_id", "embedding", k = 3, nprobe = 2,
      overfetch = Int.MaxValue / 3)
    assert(rpq.exceptAll(flat).isEmpty && flat.exceptAll(rpq).isEmpty)
    assert(spark.read.parquet(s"$dir/rpq/meta").head().getBoolean(0))
  }

  test("bloom file index: point lookups open only value-carrying " +
    "files; unindexed late files stay conservatively visible") {
    import graft.sources.Tables
    val root = java.nio.file.Files.createTempDirectory("graft-bloom")
      .toString + "/lake"
    // 8 files keyed by a column the layout is NOT sorted by
    (0L until 4000L).map(i => (i, i % 7)).toDF("id", "grp")
      .repartitionByRange(8, col("grp"), col("id"))
      .write.parquet(root)
    Tables.bloomIndexWrite(spark, root, "id")
    val hit = Tables.readBloomPruned(spark, root, "id",
      Seq(42L, 3999L))
    assert(hit.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(42L, 3999L))
    assert(hit.inputFiles.length <= 3,
      s"expected <=3 candidate files, got ${hit.inputFiles.length}")
    // absent value: zero rows even when a bloom false-positive opens
    // a file (row-level re-filter restores exactness)
    assert(Tables.readBloomPruned(spark, root, "id", Seq(999999L))
      .count() == 0L)
    // a file appended AFTER the index build is kept unconditionally
    Seq((777777L, 0L)).toDF("id", "grp")
      .write.mode("append").parquet(root)
    val late = Tables.readBloomPruned(spark, root, "id", Seq(777777L))
    assert(late.count() == 1L,
      "staleness must degrade skipping, never correctness")
  }

  // ---------------------------------------------------------------
  // AbsRangeRewrite: MinValue contract
  // ---------------------------------------------------------------

  test("AbsRangeRewrite on Long.MinValue data: unrewritten Abs throws " +
    "under ANSI, the rewrite excludes the row (mathematical abs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-absmin")
      .toString + "/t"
    Seq(Long.MinValue, -5L, 0L, 5L, 99L).toDF("x").write.parquet(dir)
    val df = spark.read.parquet(dir)
    // baseline: Spark's Abs under ANSI (the default) throws on MinValue
    // (deregister first — the shared JVM-wide session may still carry
    // the rule from another spec's register(); suite order must not
    // decide what "without the rule" means)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.AbsRangeRewrite)
    val e = intercept[Exception] {
      df.filter(abs(col("x")) <= 10L).count()
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW")
      || e.getMessage.toLowerCase.contains("overflow"))
    // with the rule: no throw, MinValue row excluded (|MinValue| > 10)
    graft.plans.AbsRangeRewrite.register(spark)
    try {
      val kept = df.filter(abs(col("x")) <= 10L)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(-5L, 0L, 5L))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.AbsRangeRewrite)
    }
  }

  // ---------------------------------------------------------------
  // Pruned partitioned reads: bound-type validation + surrogate pairs
  // ---------------------------------------------------------------

  test("readPrunedPartitioned raises on mistyped bounds instead of " +
    "wrongly skipping files") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-btype")
      .toString + "/lake"
    Seq((1L, "a", "2024-01"), (2L, "b", "2024-02"))
      .toDF("id", "s", "month")
      .write.partitionBy("month").parquet(dir)
    // numeric bound against the STRING data column s
    val e1 = intercept[IllegalArgumentException] {
      Tables.readPrunedPartitioned(spark, dir,
        Seq(("s", 1L, 5L))).count()
    }
    assert(e1.getMessage.contains("bound type mismatch"))
    // numeric bound against the STRING partition column month
    val e2 = intercept[IllegalArgumentException] {
      Tables.readPrunedPartitioned(spark, dir,
        Seq(("month", 1L, 5L))).count()
    }
    assert(e2.getMessage.contains("bound type mismatch"))
    // well-typed call still prunes + returns the partition column
    val ok = Tables.readPrunedPartitioned(spark, dir,
      Seq(("month", "2024-01", "2024-01")))
    assert(ok.inputFiles.length == 1 && ok.count() == 1L)
    assert(ok.columns.contains("month"))
  }

  test("unescapePathName keeps surrogate pairs intact next to escapes") {
    import graft.sources.Tables
    val emoji = new String(Character.toChars(0x1F600))
    assert(Tables.unescapePathName(s"a%20b${emoji}c") == s"a b${emoji}c")
    assert(Tables.unescapePathName(emoji) == emoji)
    // multi-byte UTF-8 split across consecutive escapes reassembles
    assert(Tables.unescapePathName("%C3%A9") == "é")
    // mixed: chars AROUND escapes stay chars (no byte round-trip)
    assert(Tables.unescapePathName(s"${emoji}%2F${emoji}") ==
      s"${emoji}/${emoji}")
    // %-escaped partition VALUE ('=' and space escape on write): the
    // exact directory prune must keep the matching partition. (A
    // surrogate-pair directory name is not writable on this
    // container's POSIX-locale local FS — the pure-function
    // assertions above cover that path.)
    val dir = java.nio.file.Files.createTempDirectory("graft-surr")
      .toString + "/lake"
    val v = "x=b c"
    Seq((1L, v), (2L, "plain")).toDF("id", "tag")
      .write.partitionBy("tag").parquet(dir)
    val got = Tables.readPrunedPartitioned(spark, dir,
      Seq(("tag", v, v)))
    assert(got.count() == 1L && got.inputFiles.length == 1)
    assert(got.select("id").head.getLong(0) == 1L)
  }

  test("readParquetIfExists: absent path and empty dir map to None " +
    "without a spark.read attempt; corruption still raises") {
    import graft.sources.Tables
    val base = java.nio.file.Files.createTempDirectory("graft-rpe")
      .toString
    assert(Tables.readParquetIfExists(spark, s"$base/nope").isEmpty)
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$base/empty"))
    assert(Tables.readParquetIfExists(spark, s"$base/empty").isEmpty)
    // a dir holding only hidden files is still "absent"
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$base/hiddenonly"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/hiddenonly/_SUCCESS"),
      Array.emptyByteArray)
    assert(Tables.readParquetIfExists(spark, s"$base/hiddenonly").isEmpty)
    // corruption raises eagerly (the contract the probe must not relax)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/corrupt.parquet"),
      "not parquet at all".getBytes)
    intercept[Exception] {
      Tables.readParquetIfExists(spark, s"$base/corrupt.parquet",
        eager = true)
    }
    // real data reads
    Seq(1, 2, 3).toDF("x").write.parquet(s"$base/real")
    assert(Tables.readParquetIfExists(spark, s"$base/real")
      .get.count() == 3L)
  }
}
