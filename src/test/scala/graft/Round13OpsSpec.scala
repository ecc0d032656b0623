package graft

import org.apache.spark.sql.functions._

/** Round-13: WAP commit-atomic resolution fences (the ADVICE-medium
  * crash windows), concurrent-writer merge conflicts, and the
  * overflow/sentinel loudness fixes. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"r13_$tag").toString

  // ---------------------------------------------------------------
  // WAP replay fences
  // ---------------------------------------------------------------

  test("wapBatch publish fence lives in the snapshot itself: a replay " +
    "with NO marker files cannot re-publish (the crash-between-merge-" +
    "and-marker window is gone)") {
    import graft.incremental.Snapshots
    import graft.streaming.Streaming
    import graft.checks._
    val base = tmp("wapfence")
    val root = s"$base/lake"; val quar = s"$base/quar"
    Seq((1L, "seed")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    val suite = new CheckSuite(Seq(NotNull("id")))
    val b = Seq((2L, "good")).toDF("id", "v")
    Streaming.wapBatch(b, 0L, root, suite, quar) // -> v2
    // the quarantine dir holds NOTHING for a published batch — the
    // fence must come from the snapshot pins alone
    val fs = new org.apache.hadoop.fs.Path(quar)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(quar)) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(quar)).isEmpty,
      "publish must leave no quarantine-side marker")
    Streaming.wapBatch(b, 0L, root, suite, quar) // replay
    Streaming.wapBatch(b, 0L, root, suite, quar) // replay again
    assert(Snapshots.versions(spark, root).count() == 2L,
      "replays must not mint versions")
    assert(Snapshots.readLatest(spark, root).count() == 2L,
      "replays must not duplicate rows")
    // the publishing snapshot carries the batch tag in its pins
    val pins = Snapshots.allPinnedPaths(spark, root)
    assert(pins.exists(_.contains("/merge-b0-v2/")),
      s"publish record must be in the pinned paths: $pins")
  }

  test("wapBatch publish fence: b1 does not mask b11 (tag needle " +
    "includes the -v suffix)") {
    import graft.incremental.Snapshots
    import graft.streaming.Streaming
    import graft.checks._
    val base = tmp("wapmask")
    val root = s"$base/lake"; val quar = s"$base/quar"
    Seq((1L, "seed")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root)
    val suite = new CheckSuite(Seq(NotNull("id")))
    Streaming.wapBatch(Seq((2L, "b1")).toDF("id", "v"), 1L, root, suite,
      quar)
    // batch 11 must still publish though "merge-b1" is a substring
    // of its would-be needle's neighborhood
    Streaming.wapBatch(Seq((3L, "b11")).toDF("id", "v"), 11L, root,
      suite, quar)
    assert(Snapshots.readLatest(spark, root).count() == 3L)
    assert(Snapshots.versions(spark, root).count() == 3L)
  }

  test("wapBatch quarantine crash window: a half-written quarantine " +
    "dir (rows but no completed verdicts) is UNRESOLVED — replay " +
    "re-quarantines and no branch survives") {
    import graft.incremental.Snapshots
    import graft.streaming.Streaming
    import graft.checks._
    val base = tmp("wapquar")
    val root = s"$base/lake"; val quar = s"$base/quar"
    Seq((1L, "seed")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root)
    val suite = new CheckSuite(Seq(NotNull("id")))
    val bad = Seq((null.asInstanceOf[java.lang.Long], "bad"))
      .toDF("id", "v")
    // simulate the pre-r13 crash state: rows landed, verdicts did
    // not, and (worse) the branch survived
    bad.write.parquet(s"$quar/batch-7/rows")
    Snapshots.createBranch(spark, root, "wap-b7", 1L)
    Snapshots.appendBranch(spark, root, "wap-b7", bad)
    Streaming.wapBatch(bad, 7L, root, suite, quar) // replay
    assert(Snapshots.branches(spark, root).count() == 0L,
      "no branch may survive a resolved batch")
    val verd = spark.read.parquet(s"$quar/batch-7/verdicts")
    assert(verd.filter(!col("passed")).count() == 1L,
      "replay must complete the quarantine record")
    assert(Snapshots.versions(spark, root).count() == 1L,
      "the bad batch must never touch main")
    // now resolved: a further replay is a no-op (still one version,
    // verdicts unchanged)
    Streaming.wapBatch(bad, 7L, root, suite, quar)
    assert(Snapshots.versions(spark, root).count() == 1L)
  }

  test("wapBatch empty staged batch with a passing audit is a " +
    "structural no-op: no version minted, replay-stable") {
    import graft.incremental.Snapshots
    import graft.streaming.Streaming
    import graft.checks._
    val base = tmp("wapempty")
    val root = s"$base/lake"; val quar = s"$base/quar"
    Seq((1L, "seed")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root)
    val suite = new CheckSuite(Seq(NotNull("id"))) // passes on base
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    Streaming.wapBatch(empty, 3L, root, suite, quar)
    // Spark may stage a schema-bearing empty part file (then the
    // publish is tagged like any other) or nothing at all (then the
    // batch resolves as a structural no-op) — EITHER way the replay
    // contract is what matters: history and content are stable
    val vAfter = Snapshots.versions(spark, root).count()
    val nAfter = Snapshots.readLatest(spark, root).count()
    assert(nAfter == 1L, "an empty batch must not add rows")
    Streaming.wapBatch(empty, 3L, root, suite, quar) // replay
    Streaming.wapBatch(empty, 3L, root, suite, quar) // replay again
    assert(Snapshots.versions(spark, root).count() == vAfter,
      "empty-batch replays must not mint content-identical versions")
    assert(Snapshots.readLatest(spark, root).count() == 1L)
    assert(Snapshots.branches(spark, root).count() == 0L)
  }

  // ---------------------------------------------------------------
  // Concurrent-writer merge conflict
  // ---------------------------------------------------------------

  test("two branches forked at the same head: first merge wins, the " +
    "second raises (optimistic concurrency), history stays single") {
    import graft.incremental.Snapshots
    val root = tmp("conflict") + "/lake"
    Seq((1L, "base")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Snapshots.createBranch(spark, root, "w1", 1L)
    Snapshots.createBranch(spark, root, "w2", 1L)
    Snapshots.appendBranch(spark, root, "w1",
      Seq((2L, "from-w1")).toDF("id", "v"))
    Snapshots.appendBranch(spark, root, "w2",
      Seq((3L, "from-w2")).toDF("id", "v"))
    val v2 = Snapshots.mergeBranch(spark, root, "w1")
    assert(v2 == 2L)
    val ex = intercept[IllegalArgumentException] {
      Snapshots.mergeBranch(spark, root, "w2")
    }
    assert(ex.getMessage.contains("main advanced"),
      s"conflict must name the cause: ${ex.getMessage}")
    // the loser's data never reached main; re-staging off the new
    // head is the sanctioned path
    assert(Snapshots.readLatest(spark, root).count() == 2L)
    Snapshots.dropBranch(spark, root, "w2")
    Snapshots.createBranch(spark, root, "w2b", 2L)
    Snapshots.appendBranch(spark, root, "w2b",
      Seq((3L, "from-w2")).toDF("id", "v"))
    assert(Snapshots.mergeBranch(spark, root, "w2b") == 3L)
    assert(Snapshots.readLatest(spark, root).count() == 3L)
  }

  test("stagedFiles: metadata-scale staged-set readout; empty for a " +
    "fresh branch, the appended files after a stage") {
    import graft.incremental.Snapshots
    val root = tmp("staged") + "/lake"
    Seq((1L, "a")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root)
    Snapshots.createBranch(spark, root, "s", 1L)
    assert(Snapshots.stagedFiles(spark, root, "s").isEmpty)
    Snapshots.appendBranch(spark, root, "s",
      Seq((2L, "b")).toDF("id", "v").repartition(2))
    val staged = Snapshots.stagedFiles(spark, root, "s")
    assert(staged.nonEmpty && staged.forall(_.contains("/_branch-s/")))
  }

  // ---------------------------------------------------------------
  // Loudness fixes: DTW sentinel, drift product overflow
  // ---------------------------------------------------------------

  test("dtw raises when the exact path cost reaches the saturating " +
    "sentinel instead of returning a clamped distance") {
    import graft.operators.Timeseries
    // two flat series ~10^12 CENTS apart over 1100 points: every DP
    // cell costs ~10^12, the minimal path crosses >= 1100 cells, so
    // the true distance (>= 1.1x10^15) crosses the 10^15 sentinel
    // and the pre-r13 code would have returned the clamp silently
    val rows = (1L to 1100L).flatMap(i =>
      Seq(("lo", i, 0.01), ("hi", i, 9.999999999e9)))
      .toDF("k", "x", "v")
    val ex = intercept[Exception] {
      Timeseries.dtwMatrix(rows, "k", "x", "v", band = 2).collect()
    }
    assert(ex.getMessage != null &&
      exMsg(ex).contains("saturating sentinel"),
      s"expected the sentinel raise, got: ${exMsg(ex)}")
  }

  private def exMsg(e: Throwable): String = {
    var t: Throwable = e
    val sb = new StringBuilder
    while (t != null) { sb.append(t.getMessage).append('\n'); t = t.getCause }
    sb.toString
  }

  test("drift parts raise on BIGINT overflow instead of silently " +
    "NULLing the score chain; in-range products pass unchanged") {
    import graft.checks.Drift
    // the guard itself (the public parts APIs only reach it past
    // ~3e9 input rows — unpayable in a spec, so drive the expression
    // directly): a 20-digit product raises, Long.MaxValue passes
    val over = Seq(1).toDF("x").select(Drift.longExact(
      lit("99999999999999999999").cast("decimal(38,0)"), "t").as("y"))
    val ex = intercept[Exception] { over.collect() }
    assert(exMsg(ex).contains("exceeds BIGINT"), exMsg(ex))
    val edge = Seq(1).toDF("x").select(Drift.longExact(
      lit(Long.MaxValue).cast("decimal(38,0)"), "t").as("y")).head()
    assert(edge.getLong(0) == Long.MaxValue)
    // and the normal-regime parts are byte-unchanged
    val ok = Drift.hellingerParts(
      Seq("a", "a", "b").toDF("c"), Seq("a", "b", "b").toDF("c"),
      col("c")).orderBy("category").collect()
    assert(ok.length == 2)
    assert(ok.forall(r => !r.isNullAt(r.fieldIndex("bc_num"))))
  }

  // ---------------------------------------------------------------
  // Schema evolution + pruned time travel
  // ---------------------------------------------------------------

  test("commitEvolving: add null-fills old files, drop hides bytes " +
    "without rewriting, re-add starts null-backed, type change raises") {
    import graft.incremental.Snapshots
    val root = tmp("evo") + "/lake"
    Seq((1L, 10.0)).toDF("id", "v").coalesce(1).write.parquet(root)
    assert(Snapshots.commitEvolving(spark, root) == 1L)
    Seq((2L, 20.0, "x")).toDF("id", "v", "tag").coalesce(1)
      .write.mode("append").parquet(root)
    assert(Snapshots.commitEvolving(spark, root) == 2L)
    // old pin: old shape
    assert(Snapshots.readVersionAs(spark, root, 1L).columns.toSeq ==
      Seq("id", "v"))
    // new pin: added column null-fills the pre-evolution file
    val v2 = Snapshots.readVersionAs(spark, root, 2L)
      .orderBy("id").collect()
    assert(v2.length == 2)
    assert(v2(0).isNullAt(2) && v2(1).getString(2) == "x")
    // drop hides the column at v3; v2 still shows it
    assert(Snapshots.commitEvolving(spark, root, drop = Seq("tag")) == 3L)
    assert(!Snapshots.readVersionAs(spark, root, 3L).columns
      .contains("tag"))
    assert(Snapshots.readVersionAs(spark, root, 2L).columns
      .contains("tag"))
    // re-add after the drop: v4 sees it again, null where absent
    Seq((3L, 30.0, "y")).toDF("id", "v", "tag").coalesce(1)
      .write.mode("append").parquet(root)
    assert(Snapshots.commitEvolving(spark, root) == 4L)
    val v4 = Snapshots.readVersionAs(spark, root, 4L)
    assert(v4.filter(col("tag").isNotNull).count() == 2L,
      "files that carry the bytes resurface them on re-add")
    // type change refuses
    Seq(("oops", 1.0)).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(root)
    val ex = intercept[IllegalArgumentException] {
      Snapshots.commitEvolving(spark, root)
    }
    assert(ex.getMessage.contains("changed type") ||
      ex.getMessage.contains("do not merge"), ex.getMessage)
    // unknown drop refuses
    val root2 = tmp("evo2") + "/lake"
    Seq((1L, 1.0)).toDF("id", "v").write.parquet(root2)
    intercept[IllegalArgumentException] {
      Snapshots.commitEvolving(spark, root2, drop = Seq("nope"))
    }
  }

  test("readVersionAs falls back to the files' merged schema for " +
    "versions committed schema-free; plain commit stays schema-free") {
    import graft.incremental.Snapshots
    val root = tmp("evofb") + "/lake"
    Seq((1L, "a")).toDF("id", "s").write.parquet(root)
    Snapshots.commit(spark, root) // schema-free v1
    assert(Snapshots.schemaOf(spark, root, 1L).isEmpty)
    assert(Snapshots.readVersionAs(spark, root, 1L).columns.toSeq ==
      Seq("id", "s"))
  }

  test("readVersionPruned skips files on a sorted pinned lake and " +
    "equals the pinned scan + row filter; stale pins prune with " +
    "THEIR files even after the live table evolves") {
    import graft.incremental.Snapshots
    val root = tmp("ptt") + "/lake"
    // 4 range-cut files sorted on k
    (1L to 400L).map(i => (i, i * 2)).toDF("k", "w")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.parquet(root)
    Snapshots.commit(spark, root) // v1
    val box = Seq(("k", 10L, 60L))
    val p1 = Snapshots.readVersionPruned(spark, root, 1L, box)
    assert(p1.inputFiles.length <
      Snapshots.pinnedFiles(spark, root, 1L).size)
    val f1 = Snapshots.readVersion(spark, root, 1L)
      .filter(col("k") >= 10L && col("k") <= 60L)
    assert(p1.exceptAll(f1).isEmpty && f1.exceptAll(p1).isEmpty)
    // append out-of-range rows, commit v2: the v1 probe is unchanged
    (1000L to 1100L).map(i => (i, i)).toDF("k", "w").coalesce(1)
      .write.mode("append").parquet(root)
    Snapshots.commit(spark, root)
    val p1again = Snapshots.readVersionPruned(spark, root, 1L, box)
    assert(p1again.count() == p1.count(),
      "the as-of-v1 probe must not see post-v1 appends")
    // mistyped bound still raises through the pinned path
    intercept[IllegalArgumentException] {
      Snapshots.readVersionPruned(spark, root, 1L,
        Seq(("k", "a", "z"))).count()
    }
  }

  // ---------------------------------------------------------------
  // History purge (right to be forgotten)
  // ---------------------------------------------------------------

  test("purgeWhere: a file purged to emptiness drops from every " +
    "manifest; tagged versions purge too; live branches refuse; " +
    "NULL-predicate rows survive") {
    import graft.incremental.Snapshots
    val root = tmp("purge") + "/lake"
    // file A: only subject rows; file B: mixed; file C: clean
    Seq((7L, "s1"), (7L, "s2")).toDF("uid", "v").coalesce(1)
      .write.parquet(root)
    Snapshots.commit(spark, root) // v1 = {A}
    Seq((7L, "s3"), (1L, "k1")).toDF("uid", "v").coalesce(1)
      .write.mode("append").parquet(root)
    Seq((2L, "k2")).toDF("uid", "v").coalesce(1)
      .write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2 = {A, B, C}
    Snapshots.tag(spark, root, "audit", 2L)
    // a live branch refuses the purge
    Snapshots.createBranch(spark, root, "wip", 2L)
    intercept[IllegalArgumentException] {
      Snapshots.purgeWhere(spark, root, col("uid") === 7L)
    }
    Snapshots.dropBranch(spark, root, "wip")
    val report = Snapshots.purgeWhere(spark, root, col("uid") === 7L)
      .head()
    assert(report.getLong(3) == 3L, s"3 subject rows: $report")
    assert(report.getLong(2) >= 1L,
      "the all-subject file must drop, not rewrite")
    // v1 pinned ONLY the all-subject file -> now empty but readable
    assert(Snapshots.readVersion(spark, root, 1L).count() == 0L)
    val v2 = Snapshots.readVersion(spark, root, 2L)
      .collect().map(_.getString(1)).toSet
    assert(v2 == Set("k1", "k2"), s"keep-side must survive: $v2")
    // the TAG reads the purged content (the point of a purge)
    assert(Snapshots.readTag(spark, root, "audit").count() == 2L)
    // NULL predicate rows are KEPT (purge where pred is TRUE only)
    val root2 = tmp("purgenull") + "/lake"
    Seq[(java.lang.Long, String)]((null, "n"), (7L, "s"), (1L, "k"))
      .toDF("uid", "v").coalesce(1).write.parquet(root2)
    Snapshots.commit(spark, root2)
    Snapshots.purgeWhere(spark, root2, col("uid") === 7L)
    assert(Snapshots.readLatest(spark, root2).count() == 2L,
      "NULL-predicate rows must survive a purge")
  }

  test("purgeWhere across a compaction: pre- and post-compaction " +
    "versions both lose the subject, keep-side stable at both") {
    import graft.incremental.Snapshots
    val root = tmp("purgecomp") + "/lake"
    (1L to 100L).map(i => (i, s"r$i")).toDF("uid", "v")
      .repartition(4).write.parquet(root)
    Snapshots.commit(spark, root) // v1: 4 files
    Snapshots.compact(spark, root, targetBytes = 1L << 26) // v2: 1 file
    val report = Snapshots.purgeWhere(spark, root,
      col("uid") % 10 === 0).head()
    assert(report.getLong(3) == 20L,
      s"10 subjects pinned by BOTH v1 and v2 files: $report")
    Seq(1L, 2L).foreach { v =>
      val got = Snapshots.readVersion(spark, root, v)
      assert(got.filter(col("uid") % 10 === 0).count() == 0L)
      assert(got.count() == 90L, s"v$v keep-side must hold 90 rows")
    }
  }

  // ---------------------------------------------------------------
  // Lake clone + tail consumer edges + vacuum tmp sweep
  // ---------------------------------------------------------------

  test("cloneLake: refuses non-empty dest and live branches; " +
    "schema sidecars ride; superseded unpinned files stay behind") {
    import graft.incremental.Snapshots
    val base = tmp("clonesp")
    val src = s"$base/src"; val dst = s"$base/dst"
    Seq((1L, "a")).toDF("id", "v").write.parquet(src)
    Snapshots.commitEvolving(spark, src) // schema-tracked v1
    Seq((2L, "b", 9L)).toDF("id", "v", "extra").coalesce(1)
      .write.mode("append").parquet(src)
    Snapshots.commitEvolving(spark, src) // v2
    Snapshots.expire(spark, src, keepLast = 2)
    Snapshots.createBranch(spark, src, "wip", 2L)
    intercept[IllegalArgumentException] {
      Snapshots.cloneLake(spark, src, dst)
    }
    Snapshots.dropBranch(spark, src, "wip")
    Snapshots.cloneLake(spark, src, dst)
    intercept[IllegalArgumentException] {
      Snapshots.cloneLake(spark, src, dst) // dest not empty
    }
    // recorded schemas traveled: the old pin keeps its old shape
    assert(Snapshots.readVersionAs(spark, dst, 1L).columns.toSeq ==
      Seq("id", "v"))
    assert(Snapshots.readVersionAs(spark, dst, 2L).columns
      .contains("extra"))
  }

  test("consumeTail resync after a rewrite: cursor reset + full read " +
    "is the sanctioned path; vacuum sweeps crashed .tmp manifests") {
    import graft.incremental.{SnapshotIo, Snapshots}
    val base = tmp("tailresync")
    val root = s"$base/lake"; val cursor = s"$base/cur"
    Seq((1L, 5L)).toDF("id", "day").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    var seen = 0L
    Snapshots.consumeTail(spark, root, cursor,
      (df, _) => seen += df.count())
    assert(seen == 1L)
    Snapshots.compact(spark, root, targetBytes = 1L << 26) // v2
    intercept[IllegalArgumentException] {
      Snapshots.consumeTail(spark, root, cursor, (_, _) => ())
    }
    // resync: full read + cursor fast-forward to head
    val head = 2L
    seen = Snapshots.readVersion(spark, root, head).count()
    SnapshotIo.writeLongs(spark.sparkContext.hadoopConfiguration,
      cursor, "v", Seq(head), overwrite = true)
    assert(Snapshots.consumeTail(spark, root, cursor,
      (_, _) => ()).isEmpty)
    // crashed manifest staging dir: vacuum reclaims it
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpDir = new org.apache.hadoop.fs.Path(
      s"$root/_graft_snapshots/.tmp-v=9-dead")
    fs.mkdirs(tmpDir)
    Snapshots.vacuum(spark, root)
    assert(!fs.exists(tmpDir), "vacuum must sweep crashed .tmp dirs")
  }

  // ---------------------------------------------------------------
  // Stats catalog (ANALYZE)
  // ---------------------------------------------------------------

  test("analyze/ndvStats: exact regime below capacity, theta regime " +
    "at capacity, NULLs excluded, unanalyzed column raises") {
    import graft.incremental.Snapshots
    val root = tmp("ndv") + "/lake"
    (1L to 500L).map(i => (i, i % 7, if (i % 5 == 0) null else s"u$i"))
      .toDF("id", "small", "tag")
      .write.parquet(root)
    Snapshots.commit(spark, root)
    Snapshots.analyze(spark, root, 1L, Seq("id", "small", "tag"), k = 32)
    val stats = Snapshots.ndvStats(spark, root, 1L,
      Seq("id", "small", "tag"), k = 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    // small: 7 distinct < 32 -> exact
    assert(stats("small") == ((7L, 7.0)))
    // id: 500 distinct -> theta regime, estimate in a sane band
    val (n, est) = stats("id")
    assert(n == 32L && est > 250 && est < 1000, s"id est: $est")
    // tag: 400 non-null distinct (NULLs excluded) -> theta, sane band
    assert(stats("tag")._2 > 200 && stats("tag")._2 < 800)
    intercept[IllegalArgumentException] {
      Snapshots.ndvStats(spark, root, 1L, Seq("nope"), k = 32)
    }
    // bad column name for the stats dir raises
    intercept[IllegalArgumentException] {
      Snapshots.analyze(spark, root, 1L, Seq("a/b"), k = 32)
    }
  }

  test("purgeWhere on an EVOLVED column: pre-evolution files are " +
    "unaffected (the column did not exist there) and stay untouched") {
    import graft.incremental.Snapshots
    val root = tmp("purgeevo") + "/lake"
    Seq((1L, "old")).toDF("id", "v").coalesce(1).write.parquet(root)
    Snapshots.commitEvolving(spark, root) // v1: (id, v)
    Seq((2L, "new", "subject"), (3L, "new", "other"))
      .toDF("id", "v", "owner").coalesce(1)
      .write.mode("append").parquet(root)
    Snapshots.commitEvolving(spark, root) // v2: + owner
    val report = Snapshots.purgeWhere(spark, root,
      col("owner") === "subject").head()
    assert(report.getLong(3) == 1L, s"one subject row: $report")
    assert(report.getLong(1) == 1L,
      "only the post-evolution file rewrites")
    assert(Snapshots.readVersionAs(spark, root, 1L).count() == 1L,
      "the pre-evolution file must be untouched")
    val v2 = Snapshots.readVersionAs(spark, root, 2L)
    assert(v2.count() == 2L &&
      v2.filter(col("owner") === "subject").count() == 0L)
  }

  // ---------------------------------------------------------------
  // IVF-PQ incremental append
  // ---------------------------------------------------------------

  test("ivfPqIndexAppend (residual mode): appended vectors route " +
    "through the stored centroids, and the unrestricted-budget search " +
    "equals the flat index grown through the same append path") {
    import graft.llmdata.Similarity
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings")
    val a = emb.filter(col("vec_id") % 5 =!= 0)
    val b = emb.filter(col("vec_id") % 5 === 0)
    val dir = tmp("pqappend")
    Similarity.ivfPqIndexWrite(a, "vec_id", "embedding", s"$dir/pq",
      dim = 64, m = 16, kSub = 16, nCells = 8, lloydIters = 2,
      pqIters = 2, byResidual = true)
    Similarity.ivfPqIndexAppend(spark, s"$dir/pq", b, "vec_id",
      "embedding")
    // appended rows sit in exactly the cells the STORED centroids
    // route them to
    val centroids = spark.read.parquet(s"$dir/pq/centroids")
    val expected = Similarity.assignCorpusCells(b, "vec_id",
        "embedding", broadcast(centroids))
      .select(col("vec_id"), col("cell"))
    val onDisk = spark.read.parquet(s"$dir/pq/assigned")
      .join(b.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("cell").cast("long"))
    assert(onDisk.exceptAll(expected).isEmpty &&
      expected.exceptAll(onDisk).isEmpty,
      "appended cell membership diverged from stored-centroid routing")
    // full-width vectors landed for the rerank
    assert(spark.read.parquet(s"$dir/pq/vectors").count() == emb.count())
    // search parity with the flat append twin
    Similarity.ivfIndexWrite(a, "vec_id", "embedding", s"$dir/flat",
      nCells = 8, lloydIters = 2)
    Similarity.ivfIndexAppend(spark, s"$dir/flat", b, "vec_id",
      "embedding")
    val queries = emb.filter(col("vec_id") < 10)
    val pq = Similarity.ivfPqTopKIndexed(spark, s"$dir/pq", queries,
        "vec_id", "embedding", k = 3, nprobe = 2,
        overfetch = Int.MaxValue / 3)
      .select("query_id", "neighbor_id", "rank")
    val flat = Similarity.ivfTopKIndexed(spark, s"$dir/flat", queries,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
    assert(pq.exceptAll(flat).isEmpty && flat.exceptAll(pq).isEmpty,
      "residual PQ append search diverged from the flat append twin")
  }

  // ---------------------------------------------------------------
  // Blocked exact DTW top-k
  // ---------------------------------------------------------------

  test("dtwTopKBlocked equals the brute-force matrix top-k on a " +
    "multi-regime corpus while evaluating strictly fewer than S(S-1) " +
    "candidate pairs — including a lone-block series served by the " +
    "tau fill") {
    import graft.operators.Timeseries
    import org.apache.spark.sql.expressions.Window
    val kTop = 2
    // 4 regimes x 6 series, 1e6-cent level gaps, tiny within-regime
    // jitter; plus one series alone in its grid cell (block < k ->
    // its tau must come from the deterministic fill)
    val rows = (for {
      r <- 0 until 4; i <- 0 until 6; x <- 1 to 16
    } yield (f"g${r}_$i", x.toLong,
      r * 10000.0 + ((i + x) % 3) * 0.01)) ++
      (1 to 16).map(x => ("h_lone", x.toLong, 50000.0 + (x % 2) * 0.01))
    val df = rows.toDF("k", "x", "v")
    val sCount = 25L
    val (blocked, cands) = Timeseries.dtwTopKBlockedWithCands(df, "k",
      "x", "v", band = 2, k = kTop, nSeg = 4, cellCents = 100000L)
    val nCands = cands.count()
    assert(nCands < sCount * (sCount - 1),
      s"blocked candidates must stay below S(S-1): $nCands")
    assert(nCands < 300,
      s"grid blocking barely pruned: $nCands pairs for 25 series")
    // brute-force ground truth off the exact DP matrix (the q516
    // convention: blocked superset-ladder must end REQUIRED identical)
    val m = Timeseries.dtwMatrix(df, "k", "x", "v", band = 2)
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("dtw_cents").asc, col("neighbor").asc)
    val brute = m.select(col("key_a").as("query_key"),
        col("key_b").as("neighbor"), col("dtw_cents"))
      .unionByName(m.select(col("key_b").as("query_key"),
        col("key_a").as("neighbor"), col("dtw_cents")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= kTop)
      .select("query_key", "neighbor", "rank", "dtw_cents")
    val got = blocked.select("query_key", "neighbor", "rank",
      "dtw_cents")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "blocked top-k diverged from the brute-force matrix")
    // every query answered (no one lost to thin blocks)
    assert(blocked.select("query_key").distinct().count() == sCount)
  }

  test("dtwTopKBlocked matches dtwTopK (including lb_cents) on the " +
    "same corpus at a coarse grid where blocking admits everything") {
    import graft.operators.Timeseries
    val rows = (for { i <- 0 until 8; x <- 1 to 12 }
      yield (s"s$i", x.toLong, (i * 3 + x % 5) * 1.0)).toDF("k", "x", "v")
    val blocked = Timeseries.dtwTopKBlocked(rows, "k", "x", "v",
      band = 3, k = 3, nSeg = 3, cellCents = 1L)
    val allPairs = Timeseries.dtwTopK(rows, "k", "x", "v", band = 3,
      k = 3)
    assert(blocked.exceptAll(allPairs).isEmpty &&
      allPairs.exceptAll(blocked).isEmpty,
      "blocked and all-pairs variants diverged")
  }

  test("KMV hash is 60-bit: values exceed 2^32 and stay below 2^60") {
    import graft.functions.Kmv
    val sk = Kmv.sketch((1L to 2000L).map(("g", _)).toDF("grp", "id"),
      Seq("grp"), "id", k = 2000)
    val hs = sk.select("h").collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0L && h < (1L << 60)))
    // with 2000 draws from a 60-bit space, some must exceed 2^32
    // (probability of all landing below is ~(2^-28)^2000)
    assert(hs.exists(_ > (1L << 32)), "hash domain still looks 32-bit")
    assert(hs.distinct.length == 2000, "2000 ids must not collide")
  }
}
