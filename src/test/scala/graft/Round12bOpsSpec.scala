package graft

import org.apache.spark.sql.functions._

/** Round-12 wave B: snapshot tags (named refs with retention
  * exemption), metadata-only footer aggregates, the KMV/theta distinct
  * sketch family, and PAA/rank-SAX series symbolization. */
class Round12bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"r12b_$tag").toString

  // ---------------------------------------------------------------
  // Snapshot tags
  // ---------------------------------------------------------------

  test("tag pins a version across expire+vacuum; untagged history is " +
    "reclaimed; readTag is bit-stable") {
    import graft.incremental.Snapshots
    val root = tmp("tags") + "/lake"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(2)
      .write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Snapshots.tag(spark, root, "baseline", 1L)
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2
    Snapshots.compact(spark, root, targetBytes = 1L << 20) // v3
    val dropped = Snapshots.expire(spark, root, keepLast = 1)
    assert(dropped == Seq(2L), s"only untagged v2 expires: $dropped")
    Snapshots.vacuum(spark, root)
    val base = Snapshots.readTag(spark, root, "baseline")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(base.toSeq == Seq((1L, "a"), (2L, "b")),
      "tagged content must survive expire+vacuum bit-stable")
    val latest = Snapshots.readLatest(spark, root).count()
    assert(latest == 3L)
    intercept[Exception] { Snapshots.readVersion(spark, root, 2L) }
  }

  test("tag registry: list, move (create-or-replace), drop; unknown " +
    "targets raise") {
    import graft.incremental.Snapshots
    val root = tmp("tagreg") + "/lake"
    Seq((1L, "a")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Seq((2L, "b")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2
    intercept[IllegalArgumentException] {
      Snapshots.tag(spark, root, "t", 9L) // uncommitted
    }
    intercept[IllegalArgumentException] {
      Snapshots.tag(spark, root, "bad name", 1L) // illegal chars
    }
    Snapshots.tag(spark, root, "t", 1L)
    assert(Snapshots.readTag(spark, root, "t").count() == 1L)
    Snapshots.tag(spark, root, "t", 2L) // move
    assert(Snapshots.readTag(spark, root, "t").count() == 2L)
    val reg = Snapshots.tags(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(reg.toSeq == Seq(("t", 2L)))
    intercept[IllegalArgumentException] {
      Snapshots.dropTag(spark, root, "nope")
    }
    Snapshots.dropTag(spark, root, "t")
    assert(Snapshots.tags(spark, root).count() == 0L)
  }

  test("rollback refuses to orphan a tag above the target; after " +
    "dropTag it proceeds") {
    import graft.incremental.Snapshots
    val root = tmp("tagroll") + "/lake"
    Seq((1L, "a")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Seq((2L, "b")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2
    Snapshots.tag(spark, root, "pin2", 2L)
    intercept[IllegalArgumentException] {
      Snapshots.rollback(spark, root, 1L)
    }
    Snapshots.dropTag(spark, root, "pin2")
    assert(Snapshots.rollback(spark, root, 1L) == Seq(2L))
    assert(Snapshots.readLatest(spark, root).count() == 1L)
  }

  // ---------------------------------------------------------------
  // Branches (WAP)
  // ---------------------------------------------------------------

  test("branch: staged data is invisible to main scans and pins, " +
    "visible on the branch, and publishes atomically as the next " +
    "main version; plain commits compose afterwards") {
    import graft.incremental.Snapshots
    val root = tmp("branch") + "/lake"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Snapshots.createBranch(spark, root, "wap", 1L)
    Snapshots.appendBranch(spark, root, "wap",
      Seq((3L, "c"), (4L, "d")).toDF("id", "v"))
    assert(spark.read.parquet(root).count() == 2L,
      "main directory scan must not see staged files")
    assert(Snapshots.readLatest(spark, root).count() == 2L)
    assert(Snapshots.readBranch(spark, root, "wap").count() == 4L)
    // second staged batch accumulates on the branch
    Snapshots.appendBranch(spark, root, "wap",
      Seq((5L, "e")).toDF("id", "v"))
    assert(Snapshots.readBranch(spark, root, "wap").count() == 5L)
    val v2 = Snapshots.mergeBranch(spark, root, "wap")
    assert(v2 == 2L)
    assert(Snapshots.readLatest(spark, root).count() == 5L)
    assert(Snapshots.branches(spark, root).count() == 0L,
      "merge drops the branch refs")
    // v1 time travel unchanged; plain append-then-commit still works
    assert(Snapshots.readVersion(spark, root, 1L).count() == 2L)
    Seq((6L, "f")).toDF("id", "v").write.mode("append").parquet(root)
    assert(Snapshots.commit(spark, root) == 3L)
    assert(Snapshots.readLatest(spark, root).count() == 6L,
      "published files must survive the next listing-based commit")
  }

  test("branch: merge refuses when main advanced past the fork; " +
    "dropBranch reclaims staged data with zero main effect") {
    import graft.incremental.Snapshots
    val root = tmp("branch2") + "/lake"
    Seq((1L, "a")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Snapshots.createBranch(spark, root, "stale", 1L)
    Snapshots.appendBranch(spark, root, "stale",
      Seq((2L, "b")).toDF("id", "v"))
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2: main advanced
    intercept[IllegalArgumentException] {
      Snapshots.mergeBranch(spark, root, "stale")
    }
    Snapshots.dropBranch(spark, root, "stale")
    assert(Snapshots.branches(spark, root).count() == 0L)
    assert(Snapshots.readLatest(spark, root).count() == 2L)
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/_branch-stale")),
      "dropBranch must reclaim the hidden staging area eagerly")
  }

  test("branch: fork versions are expire-exempt while the branch " +
    "lives; rollback below a fork raises") {
    import graft.incremental.Snapshots
    val root = tmp("branch3") + "/lake"
    Seq((1L, "a")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Snapshots.createBranch(spark, root, "pin", 1L)
    Seq((2L, "b")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v3
    val dropped = Snapshots.expire(spark, root, keepLast = 1)
    assert(dropped == Seq(2L), s"fork v1 must survive: $dropped")
    intercept[IllegalArgumentException] {
      Snapshots.rollback(spark, root, 0L)
    }
    Snapshots.dropBranch(spark, root, "pin")
    assert(Snapshots.expire(spark, root, keepLast = 1) == Seq(1L))
  }

  test("wapSink (MemoryStream): a passing batch publishes, a failing " +
    "batch quarantines with verdicts, main never sees a bad row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.incremental.Snapshots
    import graft.checks._
    import graft.streaming.Streaming
    implicit val sqlCtx = spark.sqlContext
    val base = tmp("wapstream")
    val root = s"$base/lake"
    val quar = s"$base/quar"
    Seq((1L, "seed")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // base v1
    val in = MemoryStream[(java.lang.Long, String)]
    val suite = new CheckSuite(Seq(NotNull("id")))
    val q = Streaming.wapSink(in.toDF().toDF("id", "v"), root, suite,
      quar, s"$base/ckpt")
    try {
      in.addData((2L: java.lang.Long, "good"))
      q.processAllAvailable()
      in.addData((null.asInstanceOf[java.lang.Long], "bad"))
      q.processAllAvailable()
      in.addData((3L: java.lang.Long, "good2"))
      q.processAllAvailable()
    } finally q.stop()
    val main = Snapshots.readLatest(spark, root)
      .collect().map(_.getString(1)).toSet
    assert(main == Set("seed", "good", "good2"),
      s"main must hold only audited rows: $main")
    assert(Snapshots.versions(spark, root).count() == 3L) // v1+2 merges
    val verd = spark.read.parquet(s"$quar/batch-1/verdicts")
    assert(verd.filter(!col("passed")).count() == 1L)
    assert(spark.read.parquet(s"$quar/batch-1/rows").count() == 1L)
    assert(Snapshots.branches(spark, root).count() == 0L)
  }

  // ---------------------------------------------------------------
  // metadataAgg
  // ---------------------------------------------------------------

  test("metadataAgg answers count/nulls/min/max from footers, " +
    "matching the scan — including an all-NULL file excluded from " +
    "the bound fold") {
    import graft.sources.Tables
    val root = tmp("metaagg") + "/lake"
    Seq[(Long, java.lang.Long)]((1L, 10L), (2L, null), (3L, 30L))
      .toDF("id", "v").coalesce(1).write.parquet(root)
    // second file: v is ALL null — bounds legitimately absent
    Seq[(Long, java.lang.Long)]((4L, null), (5L, null))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(root)
    val out = Tables.metadataAgg(spark, root, Seq("id", "v"))
      .orderBy("column").collect()
    assert(out.length == 2)
    val id = out(0)
    assert(id.getString(0) == "id" && id.getLong(1) == 5L &&
      id.getLong(2) == 0L && id.getLong(3) == 1L && id.getLong(4) == 5L)
    val v = out(1)
    assert(v.getString(0) == "v" && v.getLong(1) == 5L &&
      v.getLong(2) == 3L && v.getLong(3) == 10L && v.getLong(4) == 30L)
  }

  test("metadataAgg: onlyFiles scopes the answer; float columns raise") {
    import graft.sources.Tables
    val root = tmp("metascope") + "/lake"
    Seq((1L, 1.5), (2L, 2.5)).toDF("id", "d").coalesce(1)
      .write.parquet(root)
    Seq((9L, 9.5)).toDF("id", "d").coalesce(1)
      .write.mode("append").parquet(root)
    val one = spark.read.parquet(root).inputFiles.sorted.take(1).toSeq
    val scoped = Tables.metadataAgg(spark, root, Seq("id"), Some(one))
      .head()
    assert(scoped.getLong(1) < 3L, "scoped answer must cover one file")
    intercept[IllegalArgumentException] {
      Tables.metadataAgg(spark, root, Seq("d"))
    }
  }

  test("metadataAgg on an all-NULL-bound column with data-bearing " +
    "rows and no usable stats raises rather than answering wrong") {
    import graft.sources.Tables
    // decimal resolves to kind 'X' -> caught by the integral require
    val root = tmp("metadec") + "/lake"
    Seq((1L, BigDecimal("1.20"))).toDF("id", "m").write.parquet(root)
    intercept[IllegalArgumentException] {
      Tables.metadataAgg(spark, root, Seq("m"))
    }
  }

  // ---------------------------------------------------------------
  // KMV / theta sketches
  // ---------------------------------------------------------------

  test("KMV below capacity is the exact distinct set; estimate " +
    "reports the exact count with NULL theta") {
    import graft.functions.Kmv
    val df = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 3L))
      .toDF("grp", "id")
    val sk = Kmv.sketch(df, Seq("grp"), "id", k = 8)
    assert(sk.count() == 3L, "3 distinct ids -> 3 hashes")
    val est = Kmv.estimate(sk, Seq("grp"), k = 8).head()
    assert(est.getLong(est.fieldIndex("sketch_n")) == 3L)
    assert(est.isNullAt(est.fieldIndex("theta_h")))
    assert(est.getDouble(est.fieldIndex("distinct_est")) == 3.0)
  }

  test("KMV merge of arbitrary splits equals the one-shot sketch; at " +
    "capacity the estimator is (k-1)/theta of the kth hash") {
    import graft.functions.Kmv
    val ids = (1L to 300L).map(i => ("g", i))
    val df = ids.toDF("grp", "id")
    val k = 16
    val one = Kmv.sketch(df, Seq("grp"), "id", k)
    val parts = Seq(
      df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
      df.filter(col("id") % 3 === 2))
      .map(p => Kmv.sketch(p, Seq("grp"), "id", k))
    val folded = Kmv.merge(parts, Seq("grp"), k)
    assert(folded.exceptAll(one).isEmpty && one.exceptAll(folded).isEmpty,
      "bottom-k of parts' bottom-ks must equal the one-shot bottom-k")
    val est = Kmv.estimate(one, Seq("grp"), k).head()
    val kth = one.agg(max(col("h"))).head().getLong(0)
    assert(est.getLong(est.fieldIndex("theta_h")) == kth)
    val expected = (k - 1).toDouble / (kth.toDouble / graft.functions.Kmv.hashDomain)
    assert(est.getDouble(est.fieldIndex("distinct_est")) == expected)
    // sanity: 300 distinct, k=16 -> relative error ~ 1/sqrt(14)
    val e = est.getDouble(est.fieldIndex("distinct_est"))
    assert(e > 100 && e < 900, s"estimate wildly off: $e")
  }

  test("theta setOps exact regime: union/intersection are exact set " +
    "arithmetic when both sketches are below capacity") {
    import graft.functions.Kmv
    val a = Seq(1L, 2L, 3L, 4L).map(("g", _)).toDF("grp", "id")
    val b = Seq(3L, 4L, 5L).map(("g", _)).toDF("grp", "id")
    val k = 32
    val ops = Kmv.setOps(
      Kmv.sketch(a, Seq("grp"), "id", k),
      Kmv.sketch(b, Seq("grp"), "id", k), k).head()
    assert(ops.getDouble(ops.fieldIndex("union_est")) == 5.0)
    assert(ops.getDouble(ops.fieldIndex("inter_est")) == 2.0)
    assert(ops.getDouble(ops.fieldIndex("jaccard_est")) == 0.4)
  }

  test("theta setOps at capacity: sample intersection counts only " +
    "common hashes at or below the union theta") {
    import graft.functions.Kmv
    val k = 8
    val a = (1L to 100L).map(("g", _)).toDF("grp", "id")
    val b = (51L to 150L).map(("g", _)).toDF("grp", "id")
    val ska = Kmv.sketch(a, Seq("grp"), "id", k)
    val skb = Kmv.sketch(b, Seq("grp"), "id", k)
    val ops = Kmv.setOps(ska, skb, k).head()
    // recompute the contract by hand from the sketch hashes
    val ha = ska.select("h").collect().map(_.getLong(0)).toSet
    val hb = skb.select("h").collect().map(_.getLong(0)).toSet
    val theta = (ha ++ hb).toSeq.sorted.take(k).max
    val inter = (ha intersect hb).count(_ <= theta)
    assert(ops.getLong(ops.fieldIndex("n_inter_theta")) == inter.toLong)
    val thetaF = theta.toDouble / graft.functions.Kmv.hashDomain
    assert(ops.getDouble(ops.fieldIndex("union_est")) ==
      (k - 1).toDouble / thetaF)
    assert(ops.getDouble(ops.fieldIndex("inter_est")) ==
      inter.toDouble / thetaF)
  }

  // ---------------------------------------------------------------
  // PAA / rank-SAX
  // ---------------------------------------------------------------

  test("paa: equi-width integer segments (4/3/3 for n=10, nSeg=3), " +
    "exact sums, mean = one division") {
    import graft.operators.Timeseries
    val df = (1L to 10L).map(i => ("s", i, i.toDouble)).toDF("k", "x", "v")
    val out = Timeseries.paa(df, "k", "x", "v", nSeg = 3)
      .orderBy("seg").collect()
    assert(out.map(_.getLong(out.head.fieldIndex("seg_n"))).toSeq ==
      Seq(4L, 3L, 3L))
    // segment sums of 1..4, 5..7, 8..10 in cents
    assert(out.map(_.getLong(out.head.fieldIndex("sum_cents"))).toSeq ==
      Seq(1000L, 1800L, 2700L))
    assert(out.map(_.getDouble(out.head.fieldIndex("mean_cents"))).toSeq ==
      Seq(250.0, 600.0, 900.0))
    assert(out.map(_.getLong(out.head.fieldIndex("seg_start_x"))).toSeq ==
      Seq(1L, 5L, 8L))
  }

  test("paa raises on duplicate x and on a series shorter than nSeg") {
    import graft.operators.Timeseries
    val dup = Seq(("s", 1L, 1.0), ("s", 1L, 2.0)).toDF("k", "x", "v")
    val e1 = intercept[Exception] {
      Timeseries.paa(dup, "k", "x", "v", 2).collect()
    }
    assert(e1.getMessage.contains("duplicate x") ||
      e1.getCause != null)
    val short = Seq(("s", 1L, 1.0), ("s", 2L, 2.0)).toDF("k", "x", "v")
    val e2 = intercept[Exception] {
      Timeseries.paa(short, "k", "x", "v", 5).collect()
    }
    assert(e2.getMessage.contains("shorter than nSeg") ||
      e2.getCause != null)
  }

  test("saxWords: rank quartile cutpoints per scope, strict-greater " +
    "symbols, in-order word") {
    import graft.operators.Timeseries
    // one scope, two 4-point series over values 1..8:
    // lattice cuts (alphabet 4, cents): c1=200, c2=400, c3=600
    val df = Seq(
      ("t", 0L, 1L, 1.0), ("t", 0L, 2L, 2.0),
      ("t", 0L, 3L, 3.0), ("t", 0L, 4L, 4.0),
      ("t", 1L, 5L, 5.0), ("t", 1L, 6L, 6.0),
      ("t", 1L, 7L, 7.0), ("t", 1L, 8L, 8.0))
      .toDF("typ", "series", "x", "v")
    val words = Timeseries.saxWords(df, Seq("typ", "series"), "x", "v",
        Seq("typ"), nSeg = 4, alphabet = 4)
      .orderBy("series").collect()
    assert(words.map(_.getString(words.head.fieldIndex("word"))).toSeq ==
      Seq("aabb", "ccdd"))
  }

  test("overlapMatrix exact regime: every unordered pair, exact set " +
    "arithmetic below capacity including both difference directions") {
    import graft.functions.Kmv
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L), ("b", 5L),
      ("c", 9L)).toDF("grp", "id")
    val sk = Kmv.sketch(df, Seq("grp"), "id", k = 16)
    val m = Kmv.overlapMatrix(sk, "grp", k = 16).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(r.fieldIndex("union_est")),
          r.getDouble(r.fieldIndex("inter_est")),
          r.getDouble(r.fieldIndex("anotb_est")),
          r.getDouble(r.fieldIndex("bnota_est"))))).toMap
    assert(m.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(m(("a", "b")) == ((5.0, 2.0, 1.0, 2.0)))
    assert(m(("a", "c")) == ((4.0, 0.0, 3.0, 1.0)))
    assert(m(("b", "c")) == ((5.0, 0.0, 4.0, 1.0)))
  }

  test("overlapMatrix at capacity matches setOps on the same pair") {
    import graft.functions.Kmv
    val k = 8
    val df = ((1L to 80L).map(("a", _)) ++ (41L to 120L).map(("b", _)))
      .toDF("grp", "id")
    val sk = Kmv.sketch(df, Seq("grp"), "id", k)
    val mx = Kmv.overlapMatrix(sk, "grp", k).head()
    val ops = Kmv.setOps(
      sk.filter(col("grp") === "a"), sk.filter(col("grp") === "b"), k)
      .head()
    assert(mx.getLong(mx.fieldIndex("n_union_sketch")) ==
      ops.getLong(ops.fieldIndex("n_union_sketch")))
    assert(mx.getLong(mx.fieldIndex("n_inter_theta")) ==
      ops.getLong(ops.fieldIndex("n_inter_theta")))
    assert(mx.getDouble(mx.fieldIndex("union_est")) ==
      ops.getDouble(ops.fieldIndex("union_est")))
    assert(mx.getDouble(mx.fieldIndex("inter_est")) ==
      ops.getDouble(ops.fieldIndex("inter_est")))
  }

  test("kmvSink: streamed per-batch deltas fold to the one-shot " +
    "sketch estimate (MemoryStream, fence-free merge)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.Kmv
    import graft.streaming.Streaming
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("kmvsink")
    val in = MemoryStream[(String, Long)]
    val src = in.toDF().toDF("grp", "id")
    val q = Streaming.kmvSink(src, "grp", "id", k = 8,
      s"$root/state", s"$root/ckpt")
    try {
      in.addData(("g", 1L), ("g", 2L), ("h", 10L))
      q.processAllAvailable()
      in.addData(("g", 2L), ("g", 3L), ("h", 11L))
      q.processAllAvailable()
    } finally q.stop()
    val folded = Streaming.readKmvEstimate(spark, s"$root/state", "grp", 8)
    val oneShot = Kmv.estimate(
      Kmv.sketch(Seq(("g", 1L), ("g", 2L), ("g", 3L), ("h", 10L),
        ("h", 11L)).toDF("grp", "id"), Seq("grp"), "id", 8),
      Seq("grp"), 8)
    assert(folded.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(folded).isEmpty)
    // duplicate-merge idempotence: folding a delta twice changes nothing
    val doubled = Kmv.estimate(Kmv.merge(Seq(
      spark.read.parquet(s"$root/state/delta-0"),
      spark.read.parquet(s"$root/state/delta-0"),
      spark.read.parquet(s"$root/state/delta-1")), Seq("grp"), 8),
      Seq("grp"), 8)
    assert(doubled.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(doubled).isEmpty)
  }

  // ---------------------------------------------------------------
  // DTW
  // ---------------------------------------------------------------

  test("dtwMatrix: hand-checked alignment — a one-step shift of the " +
    "same shape costs only the boundary, not the point-wise gap") {
    import graft.operators.Timeseries
    // a: 0 0 5 0 0 ; b: 0 0 0 5 0  (same pulse, shifted by one)
    val df = (Seq((0L, 0.0), (1L, 0.0), (2L, 5.0), (3L, 0.0), (4L, 0.0))
        .map { case (x, v) => ("a", x, v) } ++
      Seq((0L, 0.0), (1L, 0.0), (2L, 0.0), (3L, 5.0), (4L, 0.0))
        .map { case (x, v) => ("b", x, v) })
      .toDF("k", "x", "v")
    val out = Timeseries.dtwMatrix(df, "k", "x", "v", band = 2).head()
    // DTW aligns the pulses: total cost 0 (warped path matches 5 to 5)
    assert(out.getLong(out.fieldIndex("dtw_cents")) == 0L,
      s"shifted pulse must align to cost 0, got $out")
    // point-wise (no warp) would cost |5-0|*2 = 1000 cents — DTW wins
  }

  test("dtwMatrix equals the hand DP on a 3x3 example and respects " +
    "the band wall") {
    import graft.operators.Timeseries
    // a = 1,2,3 ; b = 3,2,1 (cents 100,200,300 / 300,200,100)
    // full DP (band >= 2): dtw = 400 cents
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 1L, 3.0), ("b", 2L, 2.0), ("b", 3L, 1.0))
      .toDF("k", "x", "v")
    val full = Timeseries.dtwMatrix(df, "k", "x", "v", band = 2).head()
    assert(full.getLong(full.fieldIndex("dtw_cents")) == 400L)
    // band 0 forces the diagonal: |1-3|+|2-2|+|3-1| = 400 too;
    // a band-0 vs band-2 divergence needs an off-diagonal optimum:
    // a = 1,1,9 ; b = 1,9,9 -> diagonal 0+800+0=800, warped 0
    val df2 = Seq(("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 9.0),
      ("b", 1L, 1.0), ("b", 2L, 9.0), ("b", 3L, 9.0))
      .toDF("k", "x", "v")
    val diag = Timeseries.dtwMatrix(df2, "k", "x", "v", band = 0).head()
    val warp = Timeseries.dtwMatrix(df2, "k", "x", "v", band = 1).head()
    assert(diag.getLong(diag.fieldIndex("dtw_cents")) == 800L)
    assert(warp.getLong(warp.fieldIndex("dtw_cents")) == 0L)
  }

  test("dtwMatrix raises when the band cannot reach the corner and " +
    "composes with paa for long series") {
    import graft.operators.Timeseries
    val df = (Seq.tabulate(6)(i => ("a", i.toLong, i.toDouble)) ++
      Seq.tabulate(3)(i => ("b", i.toLong, i.toDouble)))
      .toDF("k", "x", "v")
    val e = intercept[Exception] {
      Timeseries.dtwMatrix(df, "k", "x", "v", band = 1).collect()
    }
    assert(e.getMessage.contains("band") || e.getCause != null)
    // PAA -> DTW: reduce both to 3 segments, then dtw runs banded
    val red = Timeseries.paa(df, "k", "x", "v", nSeg = 3)
      .select(col("k"), col("seg"),
        (col("sum_cents").cast("double") / lit(100.0)).as("v"))
    val out = Timeseries.dtwMatrix(red, "k", "seg", "v", band = 1)
    assert(out.count() == 1L)
  }

  test("dtwWithLbKeogh: the envelope bound is sound (in-plan require " +
    "passes), tight on band-aligned identical series, and raises on " +
    "unequal lengths") {
    import graft.operators.Timeseries
    val df = (Seq.tabulate(8)(i => ("a", i.toLong, (i % 4).toDouble)) ++
      Seq.tabulate(8)(i => ("b", i.toLong, ((i + 1) % 4).toDouble)))
      .toDF("k", "x", "v")
    val out = Timeseries.dtwWithLbKeogh(df, "k", "x", "v", band = 2)
      .head()
    val lb = out.getLong(out.fieldIndex("lb_cents"))
    val dtw = out.getLong(out.fieldIndex("dtw_cents"))
    assert(lb <= dtw, s"bound must hold: $lb > $dtw")
    // identical series: lb = dtw = 0
    val same = (Seq.tabulate(6)(i => ("a", i.toLong, i.toDouble)) ++
      Seq.tabulate(6)(i => ("b", i.toLong, i.toDouble)))
      .toDF("k", "x", "v")
    val z = Timeseries.dtwWithLbKeogh(same, "k", "x", "v", band = 1)
      .head()
    assert(z.getLong(z.fieldIndex("lb_cents")) == 0L &&
      z.getLong(z.fieldIndex("dtw_cents")) == 0L)
    val ragged = (Seq.tabulate(6)(i => ("a", i.toLong, 1.0)) ++
      Seq.tabulate(4)(i => ("b", i.toLong, 1.0))).toDF("k", "x", "v")
    val e = intercept[Exception] {
      Timeseries.dtwWithLbKeogh(ragged, "k", "x", "v", band = 2)
        .collect()
    }
    assert(e.getMessage.contains("equal") || e.getCause != null)
  }

  // ---------------------------------------------------------------
  // Snapshot incremental scan
  // ---------------------------------------------------------------

  test("addedBetween reads exactly the appended delta, returns an " +
    "empty frame for a no-op commit, and refuses rewritten ranges") {
    import graft.incremental.Snapshots
    val root = tmp("incscan") + "/lake"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2
    val delta = Snapshots.addedBetween(spark, root, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(delta.toSeq == Seq((3L, "c")))
    Snapshots.commit(spark, root) // v3: no new files
    val empty = Snapshots.addedBetween(spark, root, 2L, 3L)
    assert(empty.isEmpty &&
      empty.columns.toSeq == Seq("id", "v"),
      "empty delta keeps the lake schema")
    Snapshots.compact(spark, root, targetBytes = 1L << 20) // v4 rewrite
    intercept[IllegalArgumentException] {
      Snapshots.addedBetween(spark, root, 3L, 4L)
    }
    // post-rewrite appends are incremental again
    Seq((4L, "d")).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v5
    val d45 = Snapshots.addedBetween(spark, root, 4L, 5L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(d45.toSeq == Seq((4L, "d")))
  }

  test("classicalDecompose: a linear series has zero seasonal and " +
    "zero remainder; trend is the exact centered sum") {
    import graft.operators.Timeseries
    val df = (1 to 10).map(i => ("s", i.toLong, i.toDouble))
      .toDF("k", "x", "v")
    val out = Timeseries.classicalDecompose(df, "k", "x", "v", period = 3)
      .orderBy("x").collect()
    assert(out.length == 8, "first/last h rows omitted")
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("seas_num")) == 0L)
      assert(r.getLong(r.fieldIndex("resid_num")) == 0L)
    }
    val t2 = out.head
    assert(t2.getLong(t2.fieldIndex("trend_num")) == 600L) // (1+2+3)*100
  }

  test("classicalDecompose recovers a pure period-3 pattern exactly: " +
    "all remainder numerators zero, slot indices = the offsets") {
    import graft.operators.Timeseries
    val pat = Seq(100.0, 200.0, 300.0)
    val df = (0 until 9).map(i => ("s", (i + 1).toLong, pat(i % 3)))
      .toDF("k", "x", "v")
    val out = Timeseries.classicalDecompose(df, "k", "x", "v", period = 3)
      .collect()
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("trend_num")) == 60000L)
      assert(r.getLong(r.fieldIndex("resid_num")) == 0L)
      // identity v*p*sd = tn*sd + sn*p + rn
      val v = r.getLong(r.fieldIndex("v_cents"))
      val sd = r.getLong(r.fieldIndex("seas_den"))
      val sn = r.getLong(r.fieldIndex("seas_num"))
      val tn = r.getLong(r.fieldIndex("trend_num"))
      val rn = r.getLong(r.fieldIndex("resid_num"))
      assert(v * 3 * sd == tn * sd + sn * 3 + rn)
    }
    val bySlot = out.map(r => (r.getLong(r.fieldIndex("slot")),
      (r.getLong(r.fieldIndex("seas_num")),
        r.getLong(r.fieldIndex("seas_den"))))).distinct.toMap
    assert(bySlot(2L) == ((60000L, 6L)))  // +100 index
    assert(bySlot(0L) == ((-60000L, 6L))) // -100 index
    assert(bySlot(1L) == ((0L, 9L)))
  }

  test("classicalDecompose raises on even periods") {
    import graft.operators.Timeseries
    val df = Seq(("s", 1L, 1.0)).toDF("k", "x", "v")
    intercept[IllegalArgumentException] {
      Timeseries.classicalDecompose(df, "k", "x", "v", period = 4)
    }
  }

  test("dtwTopK: the pruned search equals brute-force ranks on a " +
    "deterministic 6-series fixture; unequal lengths raise") {
    import graft.operators.Timeseries
    import org.apache.spark.sql.expressions.Window
    // 6 series, values from a fixed congruential pattern
    val df = (for { s <- 0 until 6; i <- 0 until 12 }
      yield (s"s$s", i.toLong, ((s * 7 + i * 3) % 11).toDouble))
      .toDF("k", "x", "v")
    val pruned = Timeseries.dtwTopK(df, "k", "x", "v", band = 3, k = 2)
      .select("query_key", "neighbor", "rank", "dtw_cents")
    val m = Timeseries.dtwMatrix(df, "k", "x", "v", band = 3)
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("dtw_cents").asc, col("neighbor").asc)
    val brute = m.select(col("key_a").as("query_key"),
        col("key_b").as("neighbor"), col("dtw_cents"))
      .unionByName(m.select(col("key_b").as("query_key"),
        col("key_a").as("neighbor"), col("dtw_cents")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 2)
      .select("query_key", "neighbor", "rank", "dtw_cents")
    assert(pruned.exceptAll(brute).isEmpty &&
      brute.exceptAll(pruned).isEmpty)
    val ragged = (Seq.tabulate(6)(i => ("a", i.toLong, 1.0)) ++
      Seq.tabulate(4)(i => ("b", i.toLong, 1.0))).toDF("k", "x", "v")
    val e = intercept[Exception] {
      Timeseries.dtwTopK(ragged, "k", "x", "v", band = 3, k = 1)
        .collect()
    }
    assert(e.getMessage.contains("equal") || e.getCause != null)
  }

  test("NfcNormalize: decomposed and precomposed forms fold to the " +
    "same string, NULL propagates, interpreted eval == codegen path") {
    import graft.functions.NfcNormalize.nfc_normalize
    val df = Seq(
      ("pre", "café"), ("dec", "café"),
      ("plain", "cafe"), ("nul", null))
      .toDF("id", "s")
    val out = df.withColumn("n", nfc_normalize(col("s")))
      .collect().map(r => (r.getString(0), Option(r.getString(2)))).toMap
    assert(out("pre") == Some("caf\u00e9"))
    assert(out("dec") == Some("caf\u00e9"), "decomposed must compose")
    assert(out("plain") == Some("cafe"))
    assert(out("nul").isEmpty)
    // the filter pushes the expression through codegen'd predicates —
    // same answer as the projected (row-eval'd) value above
    assert(df.filter(nfc_normalize(col("s")) === "caf\u00e9")
      .count() == 2L)
    intercept[Exception] {
      Seq((1L, 2L)).toDF("a", "b")
        .select(nfc_normalize(col("b"))).collect()
    }
  }

  test("hellingerParts: identical halves give BC=1/H=0; disjoint " +
    "categories give BC=0/H=1; parts are the exact products") {
    import graft.checks.Drift
    val x = Seq("a", "a", "b", "b", "b").toDF("c")
    val same = Drift.hellingerParts(x, x, col("c")).head()
    assert(math.abs(
      same.getDouble(same.fieldIndex("bc_coefficient")) - 1.0) < 1e-12)
    assert(same.getDouble(same.fieldIndex("hellinger")) < 1e-6)
    val y = Seq("c", "d").toDF("c")
    val far = Drift.hellingerParts(x, y, col("c"))
      .orderBy("category").collect()
    assert(far.forall(r => r.getLong(r.fieldIndex("bc_num")) == 0L))
    assert(far.head.getDouble(far.head.fieldIndex("hellinger")) == 1.0)
    val ab = far.find(_.getString(0) == "a").get
    assert(ab.getLong(ab.fieldIndex("ref_cnt")) == 2L &&
      ab.getLong(ab.fieldIndex("cur_cnt")) == 0L &&
      ab.getLong(ab.fieldIndex("bc_den")) == 10L)
  }

  test("largestRemainder: hand quota — 10 units over weights 5/3/1 " +
    "give 5/3/1 plus the leftover to the largest remainder; sums " +
    "exact; zero-weight group and negative weights raise") {
    import graft.operators.Allocate
    // weights 50,30,10 cents, total 10: quotas 50/9=5.55->5, 3.33->3,
    // 1.11->1; leftover 1 goes to 'a' (remainder .55)
    val df = Seq(("g", "a", 0.50), ("g", "b", 0.30), ("g", "c", 0.10))
      .toDF("grp", "m", "w")
    val out = Allocate.largestRemainder(df, Seq("grp"), "m", "w", 10L)
      .collect().map(r => (r.getString(1),
        (r.getLong(r.fieldIndex("base_units")),
          r.getLong(r.fieldIndex("units"))))).toMap
    assert(out("a") == ((5L, 6L)))
    assert(out("b") == ((3L, 3L)))
    assert(out("c") == ((1L, 1L)))
    intercept[Exception] {
      Allocate.largestRemainder(
        Seq(("g", "a", 0.0)).toDF("grp", "m", "w"),
        Seq("grp"), "m", "w", 5L).collect()
    }
    intercept[Exception] {
      Allocate.largestRemainder(
        Seq(("g", "a", -1.0)).toDF("grp", "m", "w"),
        Seq("grp"), "m", "w", 5L).collect()
    }
  }

  test("weightedMedian: the mass midpoint, not the row midpoint; " +
    "NULL weight raises") {
    import graft.operators.Robust
    // values 1..4, weights 1,1,1,10 -> half of W=13 is reached at v=4
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 10.0))
      .map { case (v, w) => ("g", v, w) }.toDF("grp", "v", "w")
    val r = Robust.weightedMedian(df, Seq("grp"), "v", "w").head()
    assert(r.getLong(r.fieldIndex("median_cents")) == 400L)
    assert(r.getLong(r.fieldIndex("total_weight_cents")) == 1300L)
    assert(r.getLong(r.fieldIndex("n_rows")) == 4L)
    // equal weights reduce to the ordinary lower median
    val eq = Seq(1.0, 2.0, 3.0, 4.0).map(v => ("g", v, 1.0))
      .toDF("grp", "v", "w")
    val m = Robust.weightedMedian(eq, Seq("grp"), "v", "w").head()
    assert(m.getLong(m.fieldIndex("median_cents")) == 200L)
    intercept[Exception] {
      Robust.weightedMedian(
        Seq(("g", 1.0, null.asInstanceOf[java.lang.Double]))
          .toDF("grp", "v", "w"), Seq("grp"), "v", "w").collect()
    }
  }

  test("saxWords scope pooling: identical shapes in different series " +
    "share a word (the motif contract)") {
    import graft.operators.Timeseries
    val df = Seq(
      ("t", 0L, 1L, 1.0), ("t", 0L, 2L, 9.0),
      ("t", 1L, 3L, 1.0), ("t", 1L, 4L, 9.0),
      ("t", 2L, 5L, 9.0), ("t", 2L, 6L, 1.0))
      .toDF("typ", "series", "x", "v")
    val words = Timeseries.saxWords(df, Seq("typ", "series"), "x", "v",
        Seq("typ"), nSeg = 2, alphabet = 2)
      .collect().map(r => (r.getLong(1), r.getString(2))).toMap
    assert(words(0L) == words(1L), "same shape -> same word")
    assert(words(0L) != words(2L), "inverted shape -> different word")
  }
}
