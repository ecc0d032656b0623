package graft

import org.apache.spark.sql.functions._

/** Round-11 hardening + operators: UTF-8 string bound folds,
  * case-insensitive zone-map column resolution, bound-type validation,
  * partition-column-preserving pruned reads, manifest schema
  * evolution, manifest reconcile, and grid-scaled clustered rewrites. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("utf8Lt: unsigned UTF-8 byte order, diverges from UTF-16 on " +
    "supplementary-plane strings") {
    import graft.sources.Tables
    // U+FF5E (UTF-16 0xFF5E; UTF-8 EF BD 9E) vs U+1F600 (UTF-16
    // surrogate D83D DE00; UTF-8 F0 9F 98 80): Java String.< says
    // emoji < tilde, UTF-8 bytes say tilde < emoji
    val tilde = "～"
    val emoji = new String(Character.toChars(0x1F600))
    assert(emoji < tilde) // the UTF-16 order the old fold used
    assert(Tables.utf8Lt(tilde, emoji)) // the Spark/parquet order
    assert(!Tables.utf8Lt(emoji, tilde))
    // prefix rule + plain ASCII sanity
    assert(Tables.utf8Lt("ab", "abc") && !Tables.utf8Lt("abc", "ab"))
    assert(Tables.utf8Lt("2024-01", "2024-02"))
  }

  test("footer string bounds fold in UTF-8 order across row groups: " +
    "folded file bound == Spark's own min/max") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-utf8")
      .toString + "/t"
    val tilde = "～"
    val emoji = new String(Character.toChars(0x1F600))
    // small row groups force a multi-row-group file so the FOLD (not
    // parquet's per-chunk stats) decides the file bound; pad with
    // enough rows that the writer actually cuts groups
    val pad = (0 until 4000).map(i => f"m$i%05d")
    val df = (pad :+ tilde :+ emoji).toDF("s").coalesce(1)
    df.write.option("parquet.block.size", "4096")
      .option("parquet.page.size", "1024").parquet(dir)
    val nGroups = {
      val f = spark.read.parquet(dir).inputFiles.head
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f),
          spark.sparkContext.hadoopConfiguration))
      try reader.getFooter.getBlocks.size finally reader.close()
    }
    assert(nGroups > 1, s"need a multi-row-group file, got $nGroups")
    val stats = Tables.footerStatsString(spark, dir, Seq("s")).head()
    val own = spark.read.parquet(dir)
      .agg(min(col("s")), max(col("s"))).head()
    assert(stats.getString(2) == own.getString(0)) // s_min
    assert(stats.getString(3) == own.getString(1)) // s_max == emoji
    assert(stats.getString(3) == emoji)
  }

  test("case-insensitive zone-map columns: mixed-case box prunes " +
    "identically; absent column raises") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-ci")
      .toString + "/t"
    spark.range(0, 8000).select(col("id").as("x"),
        concat(lit("m"), lpad(expr("id div 1000").cast("string"), 2, "0"))
          .as("mk"))
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    val exact = Tables.footerStatsTyped(spark, dir, Seq("x", "mk"))
    val mixed = Tables.footerStatsTyped(spark, dir, Seq("X", "MK"))
    // same bounds row-for-row (output columns carry the schema case)
    assert(mixed.columns.toSeq == exact.columns.toSeq)
    val a = exact.orderBy("path").collect().map(_.toSeq)
    val b = mixed.orderBy("path").collect().map(_.toSeq)
    assert(a.zip(b).forall { case (l, r) => l == r })
    // mixed-case pruned read: same files opened, same rows
    val p1 = Tables.readPrunedBox(spark, dir, Seq(("x", 0L, 999L)))
    val p2 = Tables.readPrunedBox(spark, dir, Seq(("X", 0L, 999L)))
    assert(p1.inputFiles.sorted.sameElements(p2.inputFiles.sorted))
    assert(p1.count() == p2.count())
    val e = intercept[IllegalArgumentException](
      Tables.footerStatsTyped(spark, dir, Seq("nope")))
    assert(e.getMessage.contains("no case-insensitive match"))
  }

  test("prunedScan bound-type validation: string bound on numeric " +
    "column (and vice versa) raises instead of wrong-skipping") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-btype")
      .toString + "/t"
    spark.range(0, 2000).select(col("id").as("x"),
        concat(lit("k"), col("id").cast("string")).as("s"))
      .repartitionByRange(2, col("x")).write.parquet(dir)
    val e1 = intercept[IllegalArgumentException](
      Tables.readPrunedBox(spark, dir,
        Seq[(String, Any, Any)](("x", "0", "999"))))
    assert(e1.getMessage.contains("bound type mismatch"))
    val e2 = intercept[IllegalArgumentException](
      Tables.readPrunedBox(spark, dir,
        Seq[(String, Any, Any)](("s", 0L, 999L))))
    assert(e2.getMessage.contains("bound type mismatch"))
    // numeric-width mixes stay allowed (promote to double, never NULL)
    assert(Tables.readPrunedBox(spark, dir,
      Seq[(String, Any, Any)](("x", 0, 999))).count() == 1000L)
  }

  test("readPrunedPartitioned: k=v partition column survives in the " +
    "output schema, directory prune + footer prune compose") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
      .toString + "/t"
    // 4 partitions x 2 files each, data column x sorted within
    spark.range(0, 8000)
      .select(col("id").as("x"), (col("id") % 4).as("p"))
      .repartitionByRange(8, col("p"), col("x"))
      .write.partitionBy("p").parquet(dir)
    val all = spark.read.parquet(dir)
    val nAll = all.inputFiles.length
    // box on BOTH the partition column and a data column
    val pr = Tables.readPrunedPartitioned(spark, dir,
      Seq[(String, Any, Any)](("p", 1L, 2L), ("x", 0L, 3000L)))
    // partition column is in the output schema
    assert(pr.columns.map(_.toLowerCase).contains("p"))
    // directory prune alone halves the file set; footer prune cuts more
    assert(pr.inputFiles.length * 2 <= nAll)
    val full = all.filter(col("p").between(1L, 2L)
      && col("x").between(0L, 3000L))
    assert(pr.count() == full.count() && full.count() > 0)
    assert(pr.agg(sum("x")).head().getLong(0)
      == full.agg(sum("x")).head().getLong(0))
    // grouping by the partition column works on the pruned frame
    // (discovery types the directory value as int — cast to compare)
    val g = pr.groupBy(col("p").cast("long").as("p"))
      .agg(count(lit(1)).as("n")).orderBy("p").collect()
    assert(g.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // empty candidates: schema (incl. partition col) pinned, zero rows
    val none = Tables.readPrunedPartitioned(spark, dir,
      Seq[(String, Any, Any)](("p", 9L, 9L)))
    assert(none.count() == 0
      && none.columns.map(_.toLowerCase).contains("p"))
    // string partition values go through the UTF-8 path
    val dir2 = java.nio.file.Files.createTempDirectory("graft-part2")
      .toString + "/t"
    spark.range(0, 4000)
      .select(col("id").as("x"),
        concat(lit("m"), lpad(expr("id div 1000").cast("string"), 2, "0"))
          .as("mon"))
      .repartition(4, col("mon"))
      .write.partitionBy("mon").parquet(dir2)
    val sp = Tables.readPrunedPartitioned(spark, dir2,
      Seq[(String, Any, Any)](("mon", "m01", "m02")))
    assert(sp.select(countDistinct(col("mon"))).head().getLong(0) == 2L)
    assert(sp.count() == 2000L)
    assert(sp.inputFiles.length < spark.read.parquet(dir2)
      .inputFiles.length)
  }

  test("refreshManifest schema evolution: superset cols backfill known " +
    "files for the new column only; old pruning unchanged, new live") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-evo")
      .toString + "/t"
    spark.range(0, 8000)
      .select(col("id").as("x"), (col("id").cast("double") / 100.0)
        .as("price"))
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    Tables.writeManifest(spark, dir, Seq("x"))
    val m0 = spark.read.parquet(s"$dir/_graft_manifest")
    assert(!m0.columns.exists(_.startsWith("price")))
    // superset refresh: no new files, price bounds backfilled
    val scanned = Tables.refreshManifest(spark, dir, Seq("x", "price"))
    assert(scanned == 0L)
    val m1 = spark.read.parquet(s"$dir/_graft_manifest")
    assert(m1.columns.contains("price_min") && m1.count() == 8)
    assert(m1.filter(col("price_min").isNull).count() == 0)
    // old-column pruning unchanged
    val p1 = Tables.readPrunedManifest(spark, dir,
      Seq[(String, Any, Any)](("x", 0L, 999L)))
    assert(p1.inputFiles.length <= 2 && p1.count() == 1000L)
    // new-column pruning live
    val p2 = Tables.readPrunedManifest(spark, dir,
      Seq[(String, Any, Any)](("price", 0.0, 9.99)))
    assert(p2.inputFiles.length <= 2 && p2.count() == 1000L)
    // subset refresh keeps the superset manifest intact
    spark.range(8000, 9000).select(col("id").as("x"),
        (col("id").cast("double") / 100.0).as("price"))
      .coalesce(1).write.mode("append").parquet(dir)
    val scanned2 = Tables.refreshManifest(spark, dir, Seq("x"))
    assert(scanned2 == 1L)
    val m2 = spark.read.parquet(s"$dir/_graft_manifest")
    assert(m2.count() == 9
      && m2.filter(col("price_min").isNull).count() == 0)
    // requested column absent from the schema raises
    val e = intercept[IllegalArgumentException](
      Tables.refreshManifest(spark, dir, Seq("x", "ghost")))
    assert(e.getMessage.contains("no case-insensitive match"))
  }

  test("readPrunedManifest reconcile: un-manifested files are seen " +
    "with reconcile=true, missed without") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-rec")
      .toString + "/t"
    spark.range(0, 4000).select(col("id").as("x"))
      .repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    Tables.writeManifest(spark, dir, Seq("x"))
    // a batch lands AFTER the manifest snapshot (the lakeIngestSink
    // crash window): rows in range, invisible to the stale manifest
    spark.range(4000, 5000).select(col("id").as("x"))
      .coalesce(1).write.parquet(s"$dir/late")
    val stale = Tables.readPrunedManifest(spark, dir,
      Seq[(String, Any, Any)](("x", 3500L, 4500L)))
    assert(stale.count() == 500L) // misses the late batch
    val healed = Tables.readPrunedManifest(spark, dir,
      Seq[(String, Any, Any)](("x", 3500L, 4500L)), reconcile = true)
    assert(healed.count() == 1001L) // 3500..4500 inclusive
    // reconcile still prunes: manifest-known out-of-range files skipped
    assert(healed.inputFiles.length < spark.read
      .option("recursiveFileLookup", "true").parquet(dir)
      .inputFiles.length)
  }

  test("gridScaled rewrites: values >= 2^bits no longer degrade to " +
    "NULL keys; unbalanced spans still narrow the small column") {
    import graft.sources.Tables
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft-grid")
      .toString + "/t"
    // y max is far above 2^8: the raw interleave would NULL every key
    val df = spark.range(0, 8192).select(
      (col("id") % 64).as("xx"), (col("id") * 1000L).as("yy"))
    Layout.rewriteClusteredN(df, Seq("xx", "yy"), bits = 8,
      nFiles = 8, dir)
    val stats = Tables.footerStatsTyped(spark, dir, Seq("xx", "yy"))
    // a clustered layout narrows per-file spans on BOTH columns: the
    // widest yy span must be well under the full domain
    val spans = stats.select((col("yy_max") - col("yy_min")).as("s"))
      .agg(max("s")).head().getLong(0)
    assert(spans < 8191L * 1000L / 2L,
      s"yy span $spans suggests an unclustered (NULL-keyed) layout")
    val pruned = Tables.readPruned(spark, dir,
      Seq(("xx", 0L, 15L), ("yy", 0L, 2047000L)))
    assert(pruned.inputFiles.length < 8)
    assert(pruned.count() == spark.read.parquet(dir)
      .filter(col("xx").between(0, 15) && col("yy").between(0, 2047000L))
      .count())
    // negative cluster values raise loudly
    val e = intercept[IllegalArgumentException](
      Layout.rewriteClusteredN(
        spark.range(0, 10).select((col("id") - 5).as("a"), col("id").as("b")),
        Seq("a", "b"), bits = 4, nFiles = 2,
        java.nio.file.Files.createTempDirectory("graft-neg").toString + "/t"))
    assert(e.getMessage.contains("negative"))
  }

  test("withHilbertN: bijective over the full 3-D grid, every " +
    "consecutive key step is grid-adjacent, 2-D case equals " +
    "withHilbert exactly, out-of-range yields NULL") {
    import graft.operators.Layout
    val bits = 3; val lim = 1L << bits
    val grid = spark.range(0, lim * lim * lim).select(
      (col("id") % lim).as("x"),
      ((col("id") / lim) % lim).cast("long").as("y"),
      (col("id") / (lim * lim)).cast("long").as("z"))
    val rows = Layout.withHilbertN(grid, Seq("x", "y", "z"), bits, "h")
      .orderBy("h").collect()
    assert(rows.length == 512)
    assert(rows.map(_.getLong(3)).toSeq == (0L until 512L))
    // THE defining Hilbert property: consecutive keys are adjacent
    // cells (|dx|+|dy|+|dz| == 1) — no diagonal Morton jumps
    rows.sliding(2).foreach { case Array(a, b) =>
      val d = math.abs(a.getLong(0) - b.getLong(0)) +
        math.abs(a.getLong(1) - b.getLong(1)) +
        math.abs(a.getLong(2) - b.getLong(2))
      assert(d == 1, s"non-adjacent step at key ${a.getLong(3)}")
    }
    // n=2 reduces to the classic walk (same curve, same orientation)
    val g2 = spark.range(0, 256).select((col("id") % 16).as("x"),
      (col("id") / 16).cast("long").as("y"))
    val a2 = Layout.withHilbertN(g2, Seq("x", "y"), 4, "h")
      .orderBy("x", "y").collect()
    val b2 = Layout.withHilbert(g2, "x", "y", 4, "h")
      .orderBy("x", "y").collect()
    assert(a2.zip(b2).forall { case (p, q) => p.getLong(2) == q.getLong(2) })
    // out-of-range input -> NULL key (loud in any sort)
    val bad = Seq((8L, 1L, 1L), (1L, 2L, 3L)).toDF("x", "y", "z")
    val r = Layout.withHilbertN(bad, Seq("x", "y", "z"), 3, "h")
      .orderBy("x").collect()
    assert(!r(0).isNullAt(3) && r(1).isNullAt(3))
  }

  test("savageParts: hand-computed hypergeometric lattice, and the " +
    "uncensored-log-rank identity vs Survival.logRankParts") {
    import graft.operators.RankStats
    // A = {1, 2}, B = {2, 3}: three distinct values
    val df = Seq(("k", true, 1L), ("k", true, 2L), ("k", false, 2L),
      ("k", false, 3L)).toDF("k", "a", "v")
    val r = RankStats.savageParts(df, "k", "v", col("a"))
      .orderBy("value").collect()
    // v=1: r_a=2 r_b=2 d=1 -> e=2/4, var=1*3*2*2/(16*3)=0.25
    assert(r(0).getLong(2) == 2L && r(0).getLong(3) == 2L)
    assert(r(0).getLong(4) == 1L && r(0).getLong(5) == 0L)
    assert(r(0).getLong(6) == 2L && r(0).getLong(7) == 4L)
    assert(r(0).getDouble(8) == 0.5 && r(0).getDouble(9) == 0.25)
    // v=2: r_a=1 r_b=2 d=2 -> e_num=2 e_den=3, var=2*1*1*2/(9*2)
    assert(r(1).getLong(2) == 1L && r(1).getLong(3) == 2L)
    assert(r(1).getLong(6) == 2L && r(1).getLong(7) == 3L)
    assert(r(1).getDouble(9) == (2.0 * 1.0) * (1.0 * 2.0) / ((3.0 * 3.0) * 2.0))
    // v=3: r=1 -> variance NULL
    assert(r(2).getLong(7) == 1L && r(2).isNullAt(9))
    // identity: one key, all-event units == logRankParts row for row
    val units = Seq((true, 5L, true), (true, 7L, true), (false, 5L, true),
      (false, 9L, true), (false, 9L, true)).toDF("a", "dur", "ev")
    val lr = graft.operators.Survival.logRankParts(units, col("a"),
      "dur", "ev").orderBy("duration").collect()
    val sv = RankStats.savageParts(
      units.withColumn("k", lit("x")), "k", "dur", col("a"))
      .orderBy("value").collect()
    assert(lr.length == sv.length)
    lr.zip(sv).foreach { case (l, s) =>
      assert(l.getLong(1) == s.getLong(2)) // n_risk_a
      assert(l.getLong(2) == s.getLong(3)) // n_risk_b
      assert(l.getLong(3) == s.getLong(4)) // d_a
      assert(l.getLong(4) == s.getLong(5)) // d_b
      assert(l.getLong(5) == s.getLong(6)) // e_num
      assert(l.getLong(6) == s.getLong(7)) // e_den
      assert(l.getDouble(7) == s.getDouble(8)) // expected_a
      val lv = if (l.isNullAt(10)) Double.NaN else l.getDouble(10)
      val svv = if (s.isNullAt(9)) Double.NaN else s.getDouble(9)
      assert(lv.isNaN == svv.isNaN
        && (lv.isNaN || math.abs(lv - svv) < 1e-12))
    }
  }

  test("compactExecute: one shuffle pass, exactly one file per " +
    "next-fit group, content preserved") {
    import graft.operators.Layout
    val root = java.nio.file.Files.createTempDirectory("graft-cex")
      .toString
    val src = s"$root/small"
    spark.range(0, 4000).select(col("id").as("x"),
        (col("id") % 7).as("y"))
      .repartition(16).write.parquet(src)
    val plan = Layout.compactExecute(spark, src, s"$root/out",
      targetBytes = 40000L)
    val nGroups = plan.select(col("group_id")).distinct().count()
    val out = spark.read.parquet(s"$root/out")
    assert(out.inputFiles.length.toLong == nGroups && nGroups < 16)
    // per-group single file (one writer task per group)
    val perDir = out.inputFiles.groupBy(f =>
      f.split('/').find(_.startsWith("compaction_group=")).get)
    assert(perDir.values.forall(_.length == 1))
    // content identical (partition column aside)
    assert(out.count() == 4000L)
    assert(out.agg(sum("x")).head().getLong(0)
      == spark.read.parquet(src).agg(sum("x")).head().getLong(0))
    assert(out.select("x").except(spark.read.parquet(src).select("x"))
      .count() == 0)
  }

  test("Snapshots: commit/readVersion pin file sets, append-only " +
    "writers don't disturb v1, unreferenced sweep is exact") {
    import graft.incremental.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft-snap")
      .toString + "/lake"
    spark.range(0, 100).select(col("id").as("x"))
      .coalesce(2).write.parquet(root)
    val v1 = Snapshots.commit(spark, root)
    assert(v1 == 1L)
    spark.range(100, 150).select(col("id").as("x"))
      .coalesce(1).write.mode("append").parquet(root)
    // the appended file is unreferenced until the next commit
    assert(Snapshots.unreferencedFiles(spark, root).size == 1)
    val v2 = Snapshots.commit(spark, root)
    assert(v2 == 2L)
    assert(Snapshots.unreferencedFiles(spark, root).isEmpty)
    // time travel: v1 readers see the pre-append lake
    assert(Snapshots.readVersion(spark, root, 1L).count() == 100L)
    assert(Snapshots.readVersion(spark, root, 2L).count() == 150L)
    val vs = Snapshots.versions(spark, root).orderBy("version").collect()
    assert(vs.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 2L), (2L, 3L)))
    // unknown version raises
    val e = intercept[IllegalArgumentException](
      Snapshots.readVersion(spark, root, 9L))
    assert(e.getMessage.contains("no snapshot"))
    // snapshot metadata is invisible to data scans
    assert(spark.read.parquet(root).count() == 150L)
  }

  test("footrule: hand-computed doubled-midrank L1 with and without " +
    "ties") {
    import graft.operators.RankStats
    val noTies = Seq(("k", 1L, 10L), ("k", 2L, 30L), ("k", 3L, 20L))
      .toDF("g", "x", "y")
    val r1 = RankStats.footrule(noTies, "g", "x", "y").head()
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 4L) // 2*D, D=2
    val ties = Seq(("k", 1L, 10L), ("k", 2L, 30L), ("k", 3L, 20L),
      ("k", 3L, 20L)).toDF("g", "x", "y")
    val r2 = RankStats.footrule(ties, "g", "x", "y").head()
    // rdx: 1->2, 2->4, 3->7; rdy: 10->2, 20->5, 30->8 (2x midranks
    // 1, 2, 3.5 / 1, 2.5, 4) ; f2 = |2-2| + |4-8| + 2*|7-5| = 8
    assert(r2.getLong(1) == 4L && r2.getLong(2) == 8L)
  }

  test("readPrunedPartitioned plan: data predicate reaches " +
    "PushedFilters, partition column stays directory-derived") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-pplan")
      .toString + "/t"
    spark.range(0, 4000)
      .select(col("id").as("x"), (col("id") % 2).as("p"))
      .repartitionByRange(4, col("p"), col("x"))
      .write.partitionBy("p").parquet(dir)
    val pr = Tables.readPrunedPartitioned(spark, dir,
      Seq[(String, Any, Any)](("p", 0L, 0L), ("x", 0L, 999L)))
    val plan = pr.groupBy(col("p")).agg(sum(col("x")))
      .queryExecution.executedPlan.toString
    // data-column box is pushed to the parquet scan
    assert(plan.contains("PushedFilters")
      && plan.contains("GreaterThanOrEqual(x,0)")
      && plan.contains("LessThanOrEqual(x,999)"))
    // the partition column is NOT read from data pages — it comes
    // from the k=v directories, so ReadSchema carries only x
    assert(plan.contains("ReadSchema: struct<x:bigint>"))
  }

  test("snapshotIngestSink: each micro-batch commits a version, " +
    "pinned versions see only their batches") {
    import graft.streaming.Streaming
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-snapsink")
      .toString
    val lake = dir + "/lake"
    val in = MemoryStream[(Long, Long)]
    val q = Streaming.snapshotIngestSink(in.toDF().toDF("x", "y"),
      lake, dir + "/ckpt")
    try {
      in.addData((0L until 30L).map(i => (i, i % 3)): _*)
      q.processAllAvailable()
      in.addData((30L until 50L).map(i => (i, i % 3)): _*)
      q.processAllAvailable()
    } finally q.stop()
    import graft.incremental.Snapshots
    val vs = Snapshots.versions(spark, lake).orderBy("version")
      .collect().map(_.getLong(0)).toSeq
    assert(vs == Seq(1L, 2L))
    assert(Snapshots.readVersion(spark, lake, 1L).count() == 30L)
    assert(Snapshots.readVersion(spark, lake, 2L).count() == 50L)
    assert(Snapshots.unreferencedFiles(spark, lake).isEmpty)
  }

  test("quantileDeltaSink: streamed per-batch deltas fold to the " +
    "one-shot partial") {
    import graft.streaming.Streaming
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-qsink")
      .toString
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val q = Streaming.quantileDeltaSink(in.toDF().toDF("ts", "v"),
      "ts", "v", dir + "/counts", dir + "/ckpt")
    val rows = (1 to 40).map(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-${i % 9 + 1} 00:00:00"),
        (i % 7 + 1).toDouble))
    try {
      in.addData(rows.take(20): _*)
      q.processAllAvailable()
      in.addData(rows.drop(20): _*)
      q.processAllAvailable()
    } finally q.stop()
    val folded = Streaming.readQuantileCounts(spark, dir + "/counts")
    val one = graft.operators.AggMerge.dailyValuePartial(
      rows.toDF("ts", "v"), "ts", "v")
    assert(folded.except(one).count() == 0
      && one.except(folded).count() == 0)
  }

  test("mergeable exact quantiles: fold-of-slices == one-shot, " +
    "selection rule on a hand lattice") {
    import graft.operators.AggMerge
    val df = Seq.tabulate(10)(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-0${i % 3 + 1} 00:00:00"),
        (i + 1).toDouble)) // values 1.00..10.00
      .toDF("ts", "v")
    val parts = AggMerge.mergeValueCounts(Seq(
      AggMerge.dailyValuePartial(df.filter(col("v") <= 5.0), "ts", "v"),
      AggMerge.dailyValuePartial(df.filter(col("v") > 5.0), "ts", "v")))
    val one = AggMerge.dailyValuePartial(df, "ts", "v")
    assert(parts.except(one).count() == 0 && one.except(parts).count() == 0)
    val qs = AggMerge.finishQuantiles(parts,
      Seq((1, 2), (1, 4), (9, 10), (1, 1)))
      .orderBy("q_num", "q_den").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // n=10: median = min(v: cum*2 >= 10) = 5th value = 500 cents
    assert(qs((1L, 2L)) == 500L)
    assert(qs((1L, 4L)) == 300L) // cum*4 >= 10 -> 3rd value
    assert(qs((9L, 10L)) == 900L) // cum*10 >= 90 -> 9th
    assert(qs((1L, 1L)) == 1000L) // max
  }

  test("footerNullStats + readPrunedNulls: numNulls folds across " +
    "files, IS NULL and IS NOT NULL probes skip the right files") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-nullzm")
      .toString + "/t"
    // 4 files: all-null, half-null, zero-null, zero-null
    spark.range(0, 4000)
      .select(col("id").as("x"),
        when(col("id") < 1000, lit(null).cast("long"))
          .when(col("id") < 1500, col("id"))
          .otherwise(col("id") * 2).as("v"),
        when(col("id") >= 1000 && col("id") < 1500, lit(null)
          .cast("long")).otherwise(col("id")).as("w"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.parquet(dir)
    val stats = Tables.footerNullStats(spark, dir, Seq("v"))
      .orderBy("path").collect()
    // repartitionByRange boundaries are SAMPLE-based — per-file splits
    // wobble; the fold total and the zero-null tail are stable
    assert(stats.map(_.getLong(2)).sum == 1000L)
    val nNullFiles = stats.count(_.getLong(2) > 0)
    assert(nNullFiles <= 2 && stats.length == 4)
    val isNull = Tables.readPrunedNulls(spark, dir, "v", wantNull = true)
    assert(isNull.inputFiles.length == nNullFiles
      && isNull.count() == 1000L)
    val notNull = Tables.readPrunedNulls(spark, dir, "v",
      wantNull = false)
    val nDataFiles = stats.count(r => r.getLong(2) < r.getLong(1))
    assert(notNull.inputFiles.length == nDataFiles
      && notNull.count() == 3000L)
    // a column with scattered nulls prunes nothing but stays correct
    val wNull = Tables.readPrunedNulls(spark, dir, "w", wantNull = true)
    assert(wNull.count() == 500L)
  }

  test("bartlettParts: hand-computed variance numerators on the " +
    "cents lattice") {
    import graft.operators.Robust
    val df = Seq(("k", 1.00), ("k", 2.00), ("k", 3.00),
      ("m", 1.00), ("m", 1.00)).toDF("g", "v")
    val r = Robust.bartlettParts(df, "g", "v").orderBy("grp").collect()
    // k: n=3 sum=600 ss_num = 3*140000 - 360000 = 60000
    assert(r(0).getString(0) == "k" && r(0).getLong(1) == 3L
      && r(0).getLong(2) == 600L && r(0).getDouble(3) == 60000.0)
    // m: constant group -> zero variance numerator
    assert(r(1).getString(0) == "m" && r(1).getLong(1) == 2L
      && r(1).getLong(2) == 200L && r(1).getDouble(3) == 0.0)
    // caller fold: S2_k = 60000/(3*2) = 10000 cents^2 = var of {1,2,3}
    assert(r(0).getDouble(3) / (3.0 * 2.0) == 10000.0)
  }

  test("pairwiseContrastParts: hand-computed cleared-of-division " +
    "mean diffs on the bartlett fixture") {
    import graft.operators.Robust
    val df = Seq(("k", 1.00), ("k", 2.00), ("k", 3.00),
      ("m", 1.00), ("m", 1.00)).toDF("g", "v")
    val r = Robust.pairwiseContrastParts(df, "g", "v").collect()
    assert(r.length == 1)
    val p = r(0)
    assert(p.getString(0) == "k" && p.getString(1) == "m")
    assert(p.getLong(2) == 3L && p.getLong(3) == 2L)
    assert(p.getLong(4) == 600L && p.getLong(5) == 200L)
    // diff_num = 600*2 - 200*3 = 600 -> mean diff 600/(3*2) = 100c
    assert(p.getLong(8) == 600L)
    assert(p.getLong(8).toDouble / (3.0 * 2.0) == 100.0)
    assert(p.getDouble(6) == 60000.0 && p.getDouble(7) == 0.0)
  }

  test("flignerParts: per-group lattice medians, pooled doubled " +
    "midranks of the centered values") {
    import graft.operators.RankStats
    val df = Seq(("A", 1.00), ("A", 2.00), ("A", 3.00),
      ("B", 5.00), ("B", 5.00)).toDF("g", "v")
    val r = RankStats.flignerParts(df, "g", "v")
      .orderBy("grp", "a_cents").collect()
    // A med=200 -> a in {0:1, 100:2}; B med=500 -> a {0:2}
    // lattice: a=0 t=3 rd=4; a=100 t=2 rd=2*3+2+1=9
    assert(r.length == 3)
    assert(r(0).getString(0) == "A" && r(0).getLong(1) == 0L
      && r(0).getLong(2) == 1L && r(0).getLong(3) == 4L
      && r(0).getLong(4) == 5L)
    assert(r(1).getString(0) == "A" && r(1).getLong(1) == 100L
      && r(1).getLong(2) == 2L && r(1).getLong(3) == 9L)
    assert(r(2).getString(0) == "B" && r(2).getLong(1) == 0L
      && r(2).getLong(2) == 2L && r(2).getLong(3) == 4L)
  }

  test("brunnerMunzelParts: hand-computed placement lattice; rank " +
    "sums recover the stochastic-superiority estimate") {
    import graft.operators.RankStats
    // A = {1, 2}, B = {2, 3}
    val df = Seq(("k", true, 1L), ("k", true, 2L), ("k", false, 2L),
      ("k", false, 3L)).toDF("k", "a", "v")
    val r = RankStats.brunnerMunzelParts(df, "k", "v", col("a")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 7L && r.getLong(4) == 13L) // pooled rank sums
    assert(r.getLong(5) == 1L && r.getLong(6) == 1L) // A placements
    assert(r.getLong(7) == 7L && r.getLong(8) == 25L) // B placements
    // p-hat = (mean pooled midrank of B - (n_b+1)/2)/n_a = 0.875,
    // which equals P(A<B) + P(A=B)/2 over the 4 pairs (3 + 0.5)/4
    val pHat = (r.getLong(4).toDouble / 2.0 / 2.0 - 1.5) / 2.0
    assert(pHat == 0.875)
  }

  test("matryoshkaTopK: with an unrestricted stage-1 budget the " +
    "result equals brute force; tight budgets stay deterministic") {
    import graft.llmdata.Similarity
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings")
    val queries = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    val full = Similarity.matryoshkaTopK(emb, queries, "vec_id",
      "embedding", prefixDims = 16, m = n, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank").collect()
      .map(r => Seq(r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(full.length == brute.length
      && full.zip(brute).forall { case (a, b) => a == b })
    // tight budget: still k results per query, ranks 1..k
    val tight = Similarity.matryoshkaTopK(emb, queries, "vec_id",
      "embedding", prefixDims = 8, m = 10, k = 3)
      .groupBy("query_id").agg(count(lit(1)).as("n"),
        max(col("rank")).as("mx")).collect()
    assert(tight.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L))
  }

  test("resampleLocf: carries last value onto the grid, NULL before " +
    "first observation, duplicate (key, sec) raises in-plan") {
    import graft.operators.Timeseries
    // key k: obs at 5->1.0, 12->2.0, 31->3.0; step 10 -> grid 10,20,30
    val df = Seq(("k", 5L, 1.0), ("k", 12L, 2.0), ("k", 31L, 3.0))
      .toDF("g", "sec", "v")
    val r = Timeseries.resampleLocf(df, "g", "sec", "v", 10L)
      .orderBy("grid_sec").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L))
    assert(r.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 2.0))
    // grid point before the first obs: key m obs at 15 only, step 10
    // -> grid starts at ceil(15/10)*10 = 20 (no pre-obs point here);
    // key with obs at 25 and 31: grid 30 only
    val r2 = Timeseries.resampleLocf(
      Seq(("m", 25L, 5.0), ("m", 31L, 6.0)).toDF("g", "sec", "v"),
      "g", "sec", "v", 10L).collect()
    assert(r2.length == 1 && r2(0).getLong(1) == 30L
      && r2(0).getDouble(2) == 5.0)
    // a key whose span holds no grid point emits nothing, no crash
    val r3 = Timeseries.resampleLocf(
      Seq(("s", 5L, 1.0)).toDF("g", "sec", "v"), "g", "sec", "v", 10L)
      .collect()
    assert(r3.isEmpty)
    // duplicate (key, sec) raises in-plan (span includes a grid point
    // so the window actually evaluates)
    val dup = Seq(("k", 5L, 1.0), ("k", 5L, 2.0), ("k", 22L, 3.0))
      .toDF("g", "sec", "v")
    val e = intercept[Exception](
      Timeseries.resampleLocf(dup, "g", "sec", "v", 10L).collect())
    assert(e.getMessage.contains("duplicate (key, sec)")
      || (e.getCause != null
        && e.getCause.getMessage.contains("duplicate (key, sec)")))
  }

  test("AbsRangeRewrite: abs predicates become pushed ranges, " +
    "results unchanged incl. NaN and NULL, degenerate bounds skipped") {
    import graft.plans.AbsRangeRewrite
    AbsRangeRewrite.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-absr")
      .toString + "/t"
    spark.range(0, 2000)
      .select((col("id") - 1000).cast("double").as("c"), col("id").as("x"))
      .repartitionByRange(4, col("c")).sortWithinPartitions("c")
      .write.parquet(dir)
    val pr = spark.read.parquet(dir).filter(abs(col("c")) <= lit(100.0))
    val plan = pr.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(c,-100.0)")
      && plan.contains("LessThanOrEqual(c,100.0)"))
    assert(pr.count() == 201L)
    // strict form
    assert(spark.read.parquet(dir).filter(abs(col("c")) < lit(100.0))
      .count() == 199L)
    // NaN / NULL semantics unchanged by the rewrite
    val tricky = Seq(Some(Double.NaN), Some(-5.0), None, Some(5.0))
      .toDF("c")
    assert(tricky.filter(abs(col("c")) <= lit(10.0)).count() == 2L)
    // negative literal bound: unrewritten AND still correct (empty)
    assert(tricky.filter(abs(col("c")) <= lit(-1.0)).count() == 0L)
    // rule really is the difference: a session without it keeps Abs
    // out of PushedFilters
    val bare = spark.newSession()
    val plan2 = bare.read.parquet(dir).filter(abs(col("c")) <= lit(100.0))
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("GreaterThanOrEqual(c,-100.0)"))
  }

  test("spearmanMatrix: every pair's rho equals spearmanByKey run on " +
    "that pair") {
    import graft.operators.RankStats
    val df = Seq((1.0, 10.0, 5.0), (2.0, 20.0, 4.0), (3.0, 15.0, 4.0),
      (4.0, 40.0, 2.0), (5.0, 35.0, 1.0)).toDF("a", "b", "c")
    val m = RankStats.spearmanMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(m.size == 3)
    for ((x, y) <- Seq(("a", "b"), ("a", "c"), ("b", "c"))) {
      val single = RankStats.spearmanByKey(
        df.withColumn("k", lit("x")), "k", x, y).head()
      val got = m((x, y))
      assert(got._1 == single.getLong(1))
      assert(math.abs(got._2 - single.getDouble(2)) < 1e-12,
        s"pair ($x,$y): ${got._2} vs ${single.getDouble(2)}")
    }
    // monotone-decreasing pair scores rho ~ -1 on ranks
    assert(m(("a", "c"))._2 < -0.9)
  }

  test("cronbachAlpha: identical items give alpha 1, anti-aligned " +
    "items go negative, zero total variance yields NULL") {
    import graft.operators.Eval
    val same = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r1 = Eval.cronbachAlpha(same, Seq("x", "y")).head()
    assert(r1.getLong(0) == 3L && r1.getDouble(4) == 1.0)
    // x={1,2,3}, y={3,1,2}: ss_items = 120000, ss_total = 60000
    // -> alpha = 2*(1 - 2) = -2
    val anti = Seq((1.0, 3.0), (2.0, 1.0), (3.0, 2.0)).toDF("x", "y")
    val r2 = Eval.cronbachAlpha(anti, Seq("x", "y")).head()
    assert(r2.getDouble(2) == 120000.0 && r2.getDouble(3) == 60000.0)
    assert(r2.getDouble(4) == -2.0)
    // y = 4 - x: total is constant -> variance 0 -> alpha NULL
    val const = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(Eval.cronbachAlpha(const, Seq("x", "y")).head().isNullAt(4))
  }

  test("cmhParts: hand-computed hypergeometric 2x2 parts") {
    import graft.operators.RankStats
    val rows = Seq.fill(3)(("s", true, true)) ++ Seq(("s", true, false)) ++
      Seq(("s", false, true)) ++ Seq.fill(2)(("s", false, false))
    val df = rows.toDF("st", "ex", "pos")
    val r = RankStats.cmhParts(df, "st", col("ex"), col("pos")).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 4L
      && r.getLong(3) == 4L && r.getLong(4) == 7L)
    assert(r.getLong(5) == 16L && r.getLong(6) == 7L)
    assert(r.getDouble(7) == 16.0 / 7.0)
    assert(r.getLong(8) == 144L && r.getLong(9) == 294L)
    assert(r.getDouble(10) == 144.0 / 294.0)
  }

  test("psiParts: hand-computed exact parts; caller-side ln fold " +
    "matches psiReport on eps-free categories") {
    import graft.checks.Drift
    val ref = Seq("a", "a", "b").toDF("c")
    val cur = Seq("a", "b", "b", "b").toDF("c")
    val p = Drift.psiParts(ref, cur, col("c")).orderBy("category")
      .collect()
    // a: delta = 1*3 - 2*4 = -5; log 3/8.  b: delta = 3*3 - 1*4 = 5
    assert(p(0).getString(0) == "a" && p(0).getLong(1) == 2L
      && p(0).getLong(2) == 1L && p(0).getLong(3) == 3L
      && p(0).getLong(4) == 4L && p(0).getLong(5) == -5L
      && p(0).getLong(6) == 3L && p(0).getLong(7) == 8L)
    assert(p(1).getLong(5) == 5L && p(1).getLong(6) == 9L
      && p(1).getLong(7) == 4L)
    // fold: psi = sum delta/(rt*ct) * ln(num/den) == psiReport's sum
    val psi = p.map(r => r.getLong(5).toDouble / (3.0 * 4.0)
      * math.log(r.getLong(6).toDouble / r.getLong(7))).sum
    val rep = Drift.psiReport(ref, cur, col("c"))
      .agg(sum("psi_contribution")).head().getDouble(0)
    assert(math.abs(psi - rep) < 1e-12)
  }

  test("theilsUParts: hand-computed cell/margin parts; U(y|x) folds " +
    "to the entropy definition") {
    import graft.checks.Drift
    val df = Seq(("p", 0L), ("p", 0L), ("p", 1L), ("q", 1L))
      .toDF("xx", "yy")
    val parts = Drift.theilsUParts(df, col("xx"), col("yy"))
      .orderBy("x", "y").collect()
    // cells: (p,0)=2 (p,1)=1 (q,1)=1; n_x p=3 q=1; n_y 0=2 1=2; n=4
    assert(parts.length == 3)
    val p0 = parts(0) // (p, 0)
    assert(p0.getString(0) == "p" && p0.getLong(1) == 0L
      && p0.getLong(2) == 2L && p0.getLong(3) == 3L
      && p0.getLong(4) == 2L && p0.getLong(5) == 4L
      && p0.getLong(6) == 8L && p0.getLong(7) == 6L)
    // fold MI and H(y) caller-side and compare to direct entropies
    val mi = parts.map(r => r.getLong(2).toDouble / 4.0
      * math.log(r.getLong(6).toDouble / r.getLong(7))).sum
    val hy = math.log(4.0) -
      Seq(2.0, 2.0).map(ny => ny * math.log(ny)).sum / 4.0
    // direct: H(y) - H(y|x) with H(y|x) = sum_x p(x) H(y|X=x)
    val hyGivenX = 3.0 / 4.0 * (-(2.0 / 3.0) * math.log(2.0 / 3.0)
      - (1.0 / 3.0) * math.log(1.0 / 3.0)) + 1.0 / 4.0 * 0.0
    assert(math.abs(mi - (hy - hyGivenX)) < 1e-12)
    assert(mi / hy > 0.0 && mi / hy < 1.0)
  }

  test("equality deletes: null-safe anti-join live view, pinned key " +
    "set, compaction clears tombstones without changing the view") {
    import graft.incremental.Deletes
    val root = java.nio.file.Files
      .createTempDirectory("graft-delspec").toString + "/lake"
    Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, Option.empty[String], 30L), (4L, Option("d"), 40L))
      .toDF("id", "k", "v").write.parquet(root)
    assert(Deletes.nDeleteCommits(spark, root) == 0L)
    assert(Deletes.readWithDeletes(spark, root).count() == 4L)
    Deletes.writeDeletes(spark, root, Seq("b").toDF("k"))
    assert(Deletes.readWithDeletes(spark, root).count() == 3L)
    // NULL key is a value (<=>): tombstoning NULL removes row 3
    Deletes.writeDeletes(spark, root,
      Seq(Option.empty[String]).toDF("k"))
    assert(Deletes.readWithDeletes(spark, root)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // a second commit with a DIFFERENT key set raises
    val e = intercept[IllegalArgumentException](
      Deletes.writeDeletes(spark, root, Seq(1L).toDF("id")))
    assert(e.getMessage.contains("one key set per lake"))
    // compaction: fresh zero-tombstone lake, identical live view
    val dst = root + "-compacted"
    Deletes.compact(spark, root, dst, 1)
    assert(Deletes.nDeleteCommits(spark, dst) == 0L)
    assert(Deletes.readWithDeletes(spark, dst)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("weightedKappa: hand table — exact disagreement parts for " +
    "linear and quadratic weights; degenerate table NULLs kappa") {
    import graft.operators.Eval
    // pairs: (0,0)x2 (1,1)x1 (0,1)x1 (2,0)x1 -> n=5
    // p=1: w_obs=3, w_exp=17; p=2: w_obs=5, w_exp=23
    val df = Seq((0L, 0L), (0L, 0L), (1L, 1L), (0L, 1L), (2L, 0L))
      .toDF("a", "b")
    val r = Eval.weightedKappa(df, "a", "b").orderBy("power").collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 5L
      && r(0).getLong(2) == 3L && r(0).getLong(3) == 17L)
    assert(r(0).getDouble(4) == 1.0 - 15.0 / 17.0)
    assert(r(1).getLong(0) == 2L && r(1).getLong(2) == 5L
      && r(1).getLong(3) == 23L)
    assert(r(1).getDouble(4) == 1.0 - 25.0 / 23.0)
    // all mass on one level pair: w_exp = 0 -> NULL kappa
    val deg = Eval.weightedKappa(
      Seq((1L, 1L), (1L, 1L)).toDF("a", "b"), "a", "b").collect()
    assert(deg.forall(_.isNullAt(4)))
  }

  test("ewma: ordered left fold matches the hand recursion; " +
    "duplicates and NULLs raise in-plan; non-dyadic alpha raises") {
    import graft.operators.Timeseries
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L),
      ("k", 4L, 40L)).toDF("g", "t", "y")
    val r = Timeseries.ewma(df, "g", "t", "y", alpha = 0.5)
      .orderBy("t").select("ewma").as[Double].collect().toSeq
    assert(r == Seq(10.0, 15.0, 22.5, 31.25))
    val dup = Seq(("k", 1L, 10L), ("k", 1L, 11L)).toDF("g", "t", "y")
    val e1 = intercept[Exception](
      Timeseries.ewma(dup, "g", "t", "y", 0.5).collect())
    assert(e1.getMessage.contains("duplicate (key, order)"))
    val withNull = Seq(("k", 1L, Option(10L)), ("k", 2L, Option.empty[Long]))
      .toDF("g", "t", "y")
    val e2 = intercept[Exception](
      Timeseries.ewma(withNull, "g", "t", "y", 0.5).collect())
    assert(e2.getMessage.contains("NULL value"))
    val e3 = intercept[IllegalArgumentException](
      Timeseries.ewma(df, "g", "t", "y", 0.3))
    assert(e3.getMessage.contains("dyadic"))
  }

  test("kendallMatrix: hand triple — perfect concordance and " +
    "perfect discordance, exact C/D integers") {
    import graft.operators.RankStats
    // a=(1,2,3) b=(1,2,3) c=(3,2,1): tau(a,b)=1, tau(a,c)=tau(b,c)=-1
    val df = Seq((1L, 1L, 3L), (2L, 2L, 2L), (3L, 3L, 1L))
      .toDF("a", "b", "c")
    val m = RankStats.kendallMatrix(df, Seq("a", "b", "c"))
      .orderBy("col_a", "col_b").collect()
    assert(m.length == 3)
    // the tau chain is division-over-sqrt: 3/(√3·√3) is 1.0+1ulp —
    // assert the exact replicated chain, not the algebraic 1.0
    val one = 3.0 / (math.sqrt(3.0) * math.sqrt(3.0))
    val ab = m(0) // (a, b)
    assert(ab.getString(0) == "a" && ab.getString(1) == "b"
      && ab.getLong(2) == 3L && ab.getLong(3) == 3L
      && ab.getLong(4) == 0L && ab.getDouble(7) == one)
    val ac = m(1)
    assert(ac.getString(1) == "c" && ac.getLong(3) == 0L
      && ac.getLong(4) == 3L && ac.getDouble(7) == -one)
    val bc = m(2)
    assert(bc.getString(0) == "b" && bc.getDouble(7) == -one)
  }

  test("mmrSelect: diversity overrides raw relevance rank; seed row " +
    "carries NULL score; guards raise") {
    import graft.llmdata.Similarity
    // query (1,0); id1 nearly parallel, id2 slightly less relevant but
    // near-duplicate of id1, id3 orthogonal-ish: with lambda=0.25 the
    // diverse id3 must outrank the redundant id2
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.8f, 0.2f)), (3L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.mmrSelect(emb, emb.filter(col("vec_id") === 0L),
      "vec_id", "embedding", candK = 3, m = 3, lambda = 0.25)
      .orderBy("rank").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    assert(r(0).isNullAt(3) && r(0).isNullAt(4))
    assert(!r(1).isNullAt(3) && !r(1).isNullAt(4))
    // relevance of the seed is the global max
    assert(r.map(_.getDouble(2)).max == r(0).getDouble(2))
    val e1 = intercept[IllegalArgumentException](
      Similarity.mmrSelect(emb, emb.filter(col("vec_id") < 2),
        "vec_id", "embedding", 3, 3, 0.25))
    assert(e1.getMessage.contains("ONE query row"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.mmrSelect(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", 3, 3, 0.3))
    assert(e2.getMessage.contains("dyadic"))
  }

  test("sequenced upsert: a delete applies only to smaller-op adds — " +
    "an upsert's tombstones spare its own inserts; last-writer-wins; " +
    "duplicate-key batches raise") {
    import graft.incremental.Deletes
    val root = java.nio.file.Files
      .createTempDirectory("graft-upspec").toString + "/lake"
    Deletes.initBase(spark,
      root, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), 1)
    // update k=1, insert k=3 — one op
    Deletes.upsert(spark, root,
      Seq((1L, 11L), (3L, 30L)).toDF("k", "v"), Seq("k"))
    def view = graft.incremental.Deletes.readMerged(spark, root)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(view == Seq((1L, 11L), (2L, 20L), (3L, 30L)))
    // second upsert overwrites the first's version of k=1
    Deletes.upsert(spark, root, Seq((1L, 12L)).toDF("k", "v"), Seq("k"))
    assert(view == Seq((1L, 12L), (2L, 20L), (3L, 30L)))
    // duplicate keys within one op have no order — raise
    val e = intercept[IllegalArgumentException](Deletes.upsert(spark,
      root, Seq((5L, 1L), (5L, 2L)).toDF("k", "v"), Seq("k")))
    assert(e.getMessage.contains("duplicate key"))
    // re-seeding an existing lake raises
    val e2 = intercept[IllegalArgumentException](
      Deletes.initBase(spark, root, Seq((9L, 9L)).toDF("k", "v"), 1))
    assert(e2.getMessage.contains("already holds"))
    // compaction folds history into a fresh base (op counter reset)
    // and the compacted lake accepts further upserts
    val dst = root + "-compacted"
    Deletes.compactSequenced(spark, root, dst, 1)
    assert(Deletes.nDeleteCommits(spark, dst) == 0L)
    assert(Deletes.readMerged(spark, dst).orderBy("k")
      .as[(Long, Long)].collect().toSeq
      == Seq((1L, 12L), (2L, 20L), (3L, 30L)))
    Deletes.upsert(spark, dst, Seq((2L, 99L)).toDF("k", "v"), Seq("k"))
    assert(Deletes.readMerged(spark, dst).orderBy("k")
      .as[(Long, Long)].collect().toSeq
      == Seq((1L, 12L), (2L, 99L), (3L, 30L)))
  }

  test("ksUniformParts: hand lattice terms; single-valued key gives " +
    "NULL statistic") {
    import graft.operators.RankStats
    // {0,5,10}: D+ peaks at v=0 (10), D- at v=10 (10) -> D = 10/30
    val df = Seq(("k", 0L), ("k", 5L), ("k", 10L), ("m", 7L))
      .toDF("g", "v")
    val r = RankStats.ksUniformParts(df, "g", "v")
      .orderBy("g").collect()
    assert(r(0).getLong(1) == 3L && r(0).getLong(2) == 0L
      && r(0).getLong(3) == 10L && r(0).getLong(4) == 10L
      && r(0).getLong(5) == 30L
      && r(0).getDouble(6) == 10.0 / 30.0)
    assert(r(1).getLong(5) == 0L && r(1).isNullAt(6))
  }

  test("applyMergeBatch: delete + upsert + insert in one op; " +
    "bad op values and duplicate keys raise; delete-only batch " +
    "writes no add directory but still advances the op") {
    import graft.incremental.Deletes
    val root = java.nio.file.Files
      .createTempDirectory("graft-mbspec").toString + "/lake"
    Deletes.initBase(spark,
      root, Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), 1)
    // delete k=1, update k=2, insert k=9 — one op
    Deletes.applyMergeBatch(spark, root,
      Seq((1L, 0L, "delete"), (2L, 22L, "upsert"), (9L, 90L, "upsert"))
        .toDF("k", "v", "op"), Seq("k"), "op")
    def view = Deletes.readMerged(spark, root)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(view == Seq((2L, 22L), (3L, 30L), (9L, 90L)))
    // delete-only batch: no add dir, op still advances, next op works
    Deletes.applyMergeBatch(spark, root,
      Seq((3L, 0L, "delete")).toDF("k", "v", "op"), Seq("k"), "op")
    assert(view == Seq((2L, 22L), (9L, 90L)))
    Deletes.upsert(spark, root, Seq((2L, 23L)).toDF("k", "v"), Seq("k"))
    assert(view == Seq((2L, 23L), (9L, 90L)))
    val e1 = intercept[IllegalArgumentException](
      Deletes.applyMergeBatch(spark, root,
        Seq((2L, 1L, "drop")).toDF("k", "v", "op"), Seq("k"), "op"))
    assert(e1.getMessage.contains("'upsert'/'delete'"))
    val e2 = intercept[IllegalArgumentException](
      Deletes.applyMergeBatch(spark, root,
        Seq((5L, 1L, "upsert"), (5L, 2L, "delete"))
          .toDF("k", "v", "op"), Seq("k"), "op"))
    assert(e2.getMessage.contains("duplicate key"))
  }

  test("upsertAt: replay overwrites its own op (history and content " +
    "stable); out-of-order op raises") {
    import graft.incremental.Deletes
    val root = java.nio.file.Files
      .createTempDirectory("graft-uaspec").toString + "/lake"
    Deletes.initBase(spark,
      root, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), 1)
    Deletes.upsertAt(spark, root,
      Seq((1L, 11L), (3L, 30L)).toDF("k", "v"), Seq("k"), 1L)
    // crash replay of op 1: same content, same history
    Deletes.upsertAt(spark, root,
      Seq((1L, 11L), (3L, 30L)).toDF("k", "v"), Seq("k"), 1L)
    assert(Deletes.readMerged(spark, root).orderBy("k")
      .as[(Long, Long)].collect().toSeq
      == Seq((1L, 11L), (2L, 20L), (3L, 30L)))
    Deletes.upsertAt(spark, root,
      Seq((2L, 22L)).toDF("k", "v"), Seq("k"), 2L)
    // op 1 after op 2 exists would resurrect — raises
    val e = intercept[IllegalArgumentException](
      Deletes.upsertAt(spark, root,
        Seq((9L, 9L)).toDF("k", "v"), Seq("k"), 1L))
    assert(e.getMessage.contains("not the frontier"))
  }

  test("readMergedPruned: tombstoned rows stay dead inside candidate " +
    "files; pruning never changes the filtered merged view") {
    import graft.incremental.Deletes
    val root = java.nio.file.Files
      .createTempDirectory("graft-mpspec").toString + "/lake"
    // clustered base: ids 1..100 over 4 files
    Deletes.initBaseClustered(spark, root,
      (1L to 100L).map(i => (i, i * 10L)).toDF("k", "v"), 4, Seq("k"))
    // upsert k=5 (inside the low box) and k=90 (outside)
    Deletes.upsert(spark, root,
      Seq((5L, 555L), (90L, 900L)).toDF("k", "v"), Seq("k"))
    val pruned = Deletes.readMergedPruned(spark, root,
      Seq(("k", 1L, 25L)))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val full = Deletes.readMerged(spark, root)
      .filter(col("k").between(1L, 25L))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(pruned == full)
    assert(pruned.find(_._1 == 5L).map(_._2).contains(555L))
    assert(pruned.size == 25)
    // empty box: typed empty frame, no rows
    assert(Deletes.readMergedPruned(spark, root,
      Seq(("k", 1000L, 2000L))).count() == 0L)
  }

  test("readMergedAsOf: every intermediate state reconstructs; " +
    "pre-base asOf raises") {
    import graft.incremental.Deletes
    val root = java.nio.file.Files
      .createTempDirectory("graft-ttspec").toString + "/lake"
    Deletes.initBase(spark,
      root, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), 1)
    val op1 = Deletes.upsert(spark, root,
      Seq((1L, 11L)).toDF("k", "v"), Seq("k"))
    val op2 = Deletes.upsert(spark, root,
      Seq((2L, 22L), (3L, 33L)).toDF("k", "v"), Seq("k"))
    def at(op: Long) = Deletes.readMergedAsOf(spark, root, op)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(at(0L) == Seq((1L, 10L), (2L, 20L)))
    assert(at(op1) == Seq((1L, 11L), (2L, 20L)))
    assert(at(op2) == Seq((1L, 11L), (2L, 22L), (3L, 33L)))
    val e = intercept[IllegalArgumentException](
      Deletes.readMergedAsOf(spark, root, -1L))
    assert(e.getMessage.contains("no add-N"))
  }

  test("functionalDependency: held and violated dependencies, NULL " +
    "dependent is a value") {
    import graft.checks.FunctionalDeps
    val df = Seq((1L, Option("a")), (1L, Option("a")),
      (2L, Option("b")), (2L, Option.empty[String]),
      (3L, Option("c"))).toDF("det", "dep")
    val r = FunctionalDeps.functionalDependency(df, "det", "dep")
      .collect()(0)
    // det=2 maps to {b, NULL}: 1 violating value over 2 rows
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L
      && r.getLong(2) == 2L && r.getLong(3) == 0L)
    val ok = FunctionalDeps.functionalDependency(
      df.filter(col("det") =!= 2L), "det", "dep").collect()(0)
    assert(ok.getLong(1) == 0L && ok.getLong(3) == 1L)
  }

  test("fifoMatch: interval intersection reproduces the textbook " +
    "FIFO walk; conservation; guards raise") {
    import graft.operators.Allocate
    // lots: (s1, 5), (s2, 3); demands: (d1, 4), (d2, 4)
    // FIFO: d1 <- 4 of s1; d2 <- 1 of s1 + 3 of s2
    val sup = Seq(("k", 1L, 5L), ("k", 2L, 3L)).toDF("g", "seq", "q")
    val dem = Seq(("k", 1L, 4L), ("k", 2L, 4L)).toDF("g", "seq", "q")
    val m = Allocate.fifoMatch(sup, dem, "g", "seq", "q")
      .orderBy("supply_seq", "demand_seq")
      .select("supply_seq", "demand_seq", "matched_qty")
      .as[(Long, Long, Long)].collect().toSeq
    assert(m == Seq((1L, 1L, 4L), (1L, 2L, 1L), (2L, 2L, 3L)))
    // demand overhang: supply exhausted, matched total = 8
    assert(m.map(_._3).sum == 8L)
    val bad = Seq(("k", 1L, 0L)).toDF("g", "seq", "q")
    val e = intercept[Exception](
      Allocate.fifoMatch(bad, dem, "g", "seq", "q").collect())
    assert(e.getMessage.contains("qty must be > 0"))
    val dup = Seq(("k", 1L, 2L), ("k", 1L, 3L)).toDF("g", "seq", "q")
    val e2 = intercept[Exception](
      Allocate.fifoMatch(dup, dem, "g", "seq", "q").collect())
    assert(e2.getMessage.contains("duplicate supply seq"))
    // remaining: D=8 consumes all of s1 (5) and all of s2 (3) -> 0;
    // with demand 6: s1 fully consumed, s2 keeps 2
    val rem = Allocate.fifoRemaining(sup,
      Seq(("k", 1L, 6L)).toDF("g", "seq", "q"), "g", "seq", "q")
      .orderBy("supply_seq")
      .select("supply_seq", "lot_qty", "remaining_qty")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rem == Seq((1L, 5L, 0L), (2L, 3L, 2L)))
    // no demand at all: everything remains
    val rem0 = Allocate.fifoRemaining(sup,
      Seq.empty[(String, Long, Long)].toDF("g", "seq", "q"),
      "g", "seq", "q")
      .orderBy("supply_seq").select("remaining_qty")
      .as[Long].collect().toSeq
    assert(rem0 == Seq(5L, 3L))
  }

  test("weightedSample: zero weight never keeps, full weight always " +
    "keeps, NULL drops, and lower-weight picks nest in higher") {
    import graft.llmdata.Sampling
    val ids = (1L to 200L).map(i => (i, i))
    val df = ids.toDF("id", "x")
    val all = Sampling.weightedSample(
      df.withColumn("w", lit(1000.0)), "id", "w", 1000.0)
    assert(all.count() == 200L)
    val none = Sampling.weightedSample(
      df.withColumn("w", lit(0.0)), "id", "w", 1000.0)
    assert(none.count() == 0L)
    val nulls = Sampling.weightedSample(
      df.withColumn("w", lit(null).cast("double")), "id", "w", 1000.0)
    assert(nulls.count() == 0L)
    def kept(w: Double): Set[Long] = Sampling.weightedSample(
      df.withColumn("w", lit(w)), "id", "w", 1000.0)
      .select("id").as[Long].collect().toSet
    val lo = kept(300.0); val hi = kept(700.0)
    assert(lo.subsetOf(hi) && lo.nonEmpty && hi.size < 200)
    // deterministic: same call, same set
    assert(kept(300.0) == lo)
  }

  test("ewmaDeltaBatch/readEwma: misaligned batch splits merge to " +
    "the exact series; fold == one-shot smoother bit-for-bit") {
    import graft.streaming.Streaming
    import graft.operators.Timeseries
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ewmaspec").toString + "/deltas"
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-0${h / 24 + 1}%d ${h % 24}%02d:00:00")
    // day1: 3 events, day2: 2, day3: 1 for key "k" — split so day1
    // straddles both batches (merge must SUM, not overwrite)
    val rows = Seq(ts(1), ts(2), ts(3), ts(25), ts(26), ts(49))
      .map(t => ("k", t))
    val b1 = rows.take(2).toDF("g", "t")   // 2 of day1
    val b2 = rows.drop(2).toDF("g", "t")   // 1 of day1 + day2 + day3
    Streaming.ewmaDeltaBatch(b1, "g", "t").write.parquet(s"$dir/delta-0")
    Streaming.ewmaDeltaBatch(b2, "g", "t").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/delta-1")
    // crash replay of batch 1: overwrite its own path, never add
    Streaming.ewmaDeltaBatch(b2, "g", "t").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/delta-1")
    val folded = Streaming.readEwma(spark, dir, 0.5)
      .orderBy("day").select("y", "ewma")
      .as[(Long, Double)].collect().toSeq
    // series 3, 2, 1 -> ewma 3.0, 2.5, 1.75
    assert(folded == Seq((3L, 3.0), (2L, 2.5), (1L, 1.75)))
    val one = Timeseries.ewma(
      Streaming.ewmaDeltaBatch(rows.toDF("g", "t"), "g", "t")
        .withColumnRenamed("cnt", "y"), "key", "day", "y", 0.5)
      .orderBy("day").select("y", "ewma")
      .as[(Long, Double)].collect().toSeq
    assert(folded == one)
  }

  test("TopK.perKey: equals the window row_number form under a total " +
    "order; plan has the custom exec, an exchange, and NO sort") {
    import graft.operators.TopK
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 400).map(i =>
      (s"g${i % 5}", (i * 37) % 97, i.toLong)).toDF("g", "v", "id")
    val custom = TopK.perKey(df, Seq("g"),
      Seq(("v", false), ("id", true)), 3)
    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("g"))
          .orderBy(col("v").desc, col("id").asc)))
      .filter(col("rn") <= 3).drop("rn")
    assert(custom.count() == 15)
    assert(custom.exceptAll(win).count() == 0
      && win.exceptAll(custom).count() == 0)
    val phys = custom.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerKey"))
    assert(phys.contains("Exchange"))
    assert(!phys.contains("Sort "), s"unexpected sort in:\n$phys")
    // boundary ties under a total order: deterministic kept set
    val ties = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 1L, 3L),
      ("a", 0L, 4L)).toDF("g", "v", "id")
    val kept = TopK.perKey(ties, Seq("g"),
      Seq(("v", false), ("id", true)), 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L))
    // NULL ordering matches the window defaults (DESC -> NULLS LAST)
    val withNull = Seq(("a", Option(5L), 1L), ("a", Option.empty[Long], 2L),
      ("a", Option(7L), 3L)).toDF("g", "v", "id")
    val k2 = TopK.perKey(withNull, Seq("g"), Seq(("v", false), ("id", true)), 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(k2 == Seq(1L, 3L))
  }

  test("iccConsistency: additive subject+item table gives ICC 1 " +
    "exactly; Spearman-Brown ties ICC(C,1) to Cronbach's alpha") {
    import graft.operators.Eval
    // x_ij = s_i + b_j: zero residual -> ICC exactly 1
    val add = Seq((10.0, 11.0, 13.0), (20.0, 21.0, 23.0),
      (5.0, 6.0, 8.0), (40.0, 41.0, 43.0)).toDF("i1", "i2", "i3")
    val r1 = Eval.iccConsistency(add, Seq("i1", "i2", "i3")).collect()(0)
    assert(r1.getDouble(4) == 0.0) // ss_err_d
    assert(r1.getDouble(5) == 1.0)
    // noisy table: alpha == k*icc / (1 + (k-1)*icc) (Spearman-Brown);
    // both sides are double chains off exact numerators -> tight tol
    val noisy = Seq((10.0, 14.0, 9.0), (20.0, 19.0, 24.0),
      (5.0, 9.0, 3.0), (40.0, 35.0, 44.0), (15.0, 18.0, 13.0))
      .toDF("i1", "i2", "i3")
    val icc = Eval.iccConsistency(noisy, Seq("i1", "i2", "i3"))
      .collect()(0).getDouble(5)
    val alpha = Eval.cronbachAlpha(noisy, Seq("i1", "i2", "i3"))
      .collect()(0).getDouble(4)
    assert(math.abs(alpha - 3.0 * icc / (1.0 + 2.0 * icc)) < 1e-12)
  }

  test("agreementCoefficients: perfect agreement gives pi = AC1 = 1; " +
    "hand table matches the cleared-denominator formulas") {
    import graft.operators.Eval
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"))
      .toDF("a", "b")
    val p = Eval.agreementCoefficients(perfect, "a", "b").collect()(0)
    assert(p.getDouble(4) == 1.0 && p.getDouble(5) == 1.0)
    // hand table: (x,x)x3 (y,y)x1 (x,y)x1 (y,x)x1 -> n=6, A=4
    // margins: r_x=4 r_y=2 c_x=4 c_y=2 -> m_x=8 m_y=4 -> B=80, k=2
    // pi  = (4*6*4-80)/(4*36-80) = 16/64
    // AC1 = (96*1-144+80)/(144*1-144+80) = 32/80
    val hand = Seq(("x", "x"), ("x", "x"), ("x", "x"), ("y", "y"),
      ("x", "y"), ("y", "x")).toDF("a", "b")
    val h = Eval.agreementCoefficients(hand, "a", "b").collect()(0)
    assert(h.getLong(0) == 6L && h.getLong(1) == 2L
      && h.getLong(2) == 4L && h.getLong(3) == 80L)
    assert(h.getDouble(4) == 16.0 / 64.0)
    assert(h.getDouble(5) == 32.0 / 80.0)
    // all mass on one category: pi denominator 0 -> NULL; k=1 -> AC1 NULL
    val deg = Eval.agreementCoefficients(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b").collect()(0)
    assert(deg.isNullAt(4) && deg.isNullAt(5))
  }

  test("holtLinear: hand two-state recursion; level+trend track a " +
    "perfect linear series after the seed steps") {
    import graft.operators.Timeseries
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L))
      .toDF("g", "t", "y")
    val r = Timeseries.holtLinear(df, "g", "t", "y", 0.5, 0.25)
      .orderBy("t").select("level", "trend")
      .as[(Double, Double)].collect().toSeq
    // seed: l=10 b=0
    // t2: l = 20*.5 + (10+0)*.5 = 15 ; b = (15-10)*.25 + 0*.75 = 1.25
    // t3: l = 30*.5 + (15+1.25)*.5 = 23.125
    //     b = (23.125-15)*.25 + 1.25*.75 = 2.96875
    assert(r == Seq((10.0, 0.0), (15.0, 1.25), (23.125, 2.96875)))
    val e = intercept[IllegalArgumentException](
      Timeseries.holtLinear(df, "g", "t", "y", 0.5, 0.3))
    assert(e.getMessage.contains("dyadic"))
  }

  test("temperatureMixWeights: sqrt-count weights with a " +
    "deterministic ordered normalizer") {
    import graft.llmdata.Sampling
    val df = (Seq.fill(4)("en") ++ Seq("fr")).map(l => (l, 1))
      .toDF("lang", "x")
    val r = Sampling.temperatureMixWeights(df, "lang")
      .orderBy("lang").collect()
    assert(r(0).getString(0) == "en" && r(0).getLong(1) == 4L
      && r(0).getDouble(2) == 2.0 && r(0).getDouble(3) == 2.0 / 3.0)
    assert(r(1).getString(0) == "fr" && r(1).getDouble(3) == 1.0 / 3.0)
  }

  test("quartileScore: lattice thresholds give exact 1..4 scores on " +
    "1..8; rfmScores wires the three metrics") {
    import graft.operators.Profile
    val df = (1L to 8L).map(v => (v, v)).toDF("id", "v")
    val s = Profile.quartileScore(df, "v", "s")
      .orderBy("v").select("s").as[Long].collect().toSeq
    assert(s == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
    val ev = Seq(
      (1L, "2024-01-10 00:00:00", 10.0), // recent, 1 event
      (2L, "2024-01-01 00:00:00", 50.0), // stale, 2 events
      (2L, "2024-01-02 00:00:00", 40.0))
      .toDF("u", "tss", "value")
      .withColumn("ts", col("tss").cast("timestamp"))
    val rfm = Profile.rfmScores(ev, "u", "ts", "value")
      .orderBy("u").collect()
    assert(rfm(0).getLong(1) == 0L && rfm(0).getLong(2) == 1L
      && rfm(0).getLong(3) == 1000L)
    assert(rfm(1).getLong(1) == 8L && rfm(1).getLong(2) == 2L
      && rfm(1).getLong(3) == 9000L)
  }

  test("bitmapDistinctPartial: word-boundary ids, OR-idempotent " +
    "merge, exact counts; negative id raises") {
    import graft.operators.AggMerge
    val a = Seq(("k", 0L), ("k", 31L), ("k", 32L), ("k", 63L),
      ("k", 64L), ("k", 31L)).toDF("g", "id")
    val p1 = AggMerge.bitmapDistinctPartial(a, "g", "id")
    // 5 distinct ids across words 0,1,2
    assert(AggMerge.bitmapDistinctCount(p1).collect()(0).getLong(1) == 5L)
    val b = Seq(("k", 31L), ("k", 100L)).toDF("g", "id")
    val p2 = AggMerge.bitmapDistinctPartial(b, "g", "id")
    // re-merge p2 twice: OR idempotence — still 6 distinct
    val m = AggMerge.mergeBitmapPartials(Seq(p1, p2, p2))
    assert(AggMerge.bitmapDistinctCount(m).collect()(0).getLong(1) == 6L)
    val neg = Seq(("k", -1L)).toDF("g", "id")
    val e = intercept[Exception](
      AggMerge.bitmapDistinctPartial(neg, "g", "id").collect())
    assert(e.getMessage.contains("negative id"))
  }

  test("hodgesLehmannShift: lower median of the pairwise-difference " +
    "multiset; empty side gives NULL shift") {
    import graft.operators.RankStats
    // A = {1, 3}, B = {2}: diffs {-1, +1}, T=2 -> lower median -1
    val df = Seq(("k", 1L, true), ("k", 3L, true), ("k", 2L, false),
      ("m", 5L, true)).toDF("g", "v", "ia")
    val r = RankStats.hodgesLehmannShift(df, "g", "v", col("ia"))
      .orderBy("g").collect()
    assert(r(0).getString(0) == "k" && r(0).getLong(1) == 2L
      && r(0).getLong(2) == 1L && r(0).getLong(3) == 2L
      && r(0).getLong(4) == -1L)
    assert(r(1).getString(0) == "m" && r(1).getLong(3) == 0L
      && r(1).isNullAt(4))
    // tie weights: A = {1,1,3}, B = {1}: diffs 0(x2), 2(x1), T=3
    // cum(0)=2, 2*2>=3 -> median 0
    val t2 = Seq(("k", 1L, true), ("k", 1L, true), ("k", 3L, true),
      ("k", 1L, false)).toDF("g", "v", "ia")
    assert(RankStats.hodgesLehmannShift(t2, "g", "v", col("ia"))
      .collect()(0).getLong(4) == 0L)
  }

  test("bitmapOverlap: exact intersections across word boundaries; " +
    "disjoint pair emits zero") {
    import graft.operators.AggMerge
    // a: {1, 33, 40}; b: {33, 40, 99}; c: {500} (disjoint from both)
    val df = Seq(("a", 1L), ("a", 33L), ("a", 40L),
      ("b", 33L), ("b", 40L), ("b", 99L), ("c", 500L)).toDF("g", "id")
    val r = AggMerge.bitmapOverlap(
      AggMerge.bitmapDistinctPartial(df, "g", "id"))
      .orderBy("key_a", "key_b").collect()
    assert(r.length == 3)
    val ab = r(0)
    assert(ab.getString(0) == "a" && ab.getString(1) == "b"
      && ab.getLong(2) == 3L && ab.getLong(3) == 3L
      && ab.getLong(4) == 2L && ab.getLong(5) == 4L
      && ab.getDouble(6) == 0.5)
    assert(r(1).getString(1) == "c" && r(1).getLong(4) == 0L)
    assert(r(2).getString(0) == "b" && r(2).getLong(4) == 0L)
  }

  test("bottomK: mergeable — bottom-k of the union equals bottom-k " +
    "of the parts' bottom-ks") {
    import graft.llmdata.Sampling
    val all = (1L to 300L).map(i => (i, if (i % 2 == 0) "x" else "y"))
      .toDF("id", "s")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.bottomK(df, "id", "s", 5)
        .select("s", "id").as[(String, Long)].collect().toSet
    val whole = ids(all)
    val parts = ids(Sampling.bottomK(all.filter(col("id") <= 150),
      "id", "s", 5).select("id", "s")
      .unionAll(Sampling.bottomK(all.filter(col("id") > 150),
        "id", "s", 5).select("id", "s")))
    assert(whole == parts && whole.size == 10)
  }

  test("DateTruncRangeRewrite: year/trunc equality rewrites to the " +
    "half-open range with identical row results; misaligned trunc " +
    "literals stay unrewritten") {
    import graft.plans.DateTruncRangeRewrite
    DateTruncRangeRewrite.register(spark)
    // parquet-backed (a LocalRelation filter constant-folds away
    // before the plan can be inspected)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dtr").toString + "/t"
    Seq("1997-12-31", "1998-01-01", "1998-07-15", "1998-12-31",
      "1999-01-01").map(s => Tuple1(java.sql.Date.valueOf(s)))
      .toDF("d").write.parquet(dir)
    val df = spark.read.parquet(dir)
    // year(): boundary-exact — 3 rows of 1998
    val y = df.filter(expr("year(d) = 1998"))
    assert(y.count() == 3L)
    val yPlan = y.queryExecution.optimizedPlan.toString
    assert(yPlan.contains(">= 1998-01-01") || yPlan.contains("1998-01-01"))
    assert(!yPlan.contains("year("), s"year() survived rewrite:\n$yPlan")
    // trunc month, aligned literal
    val m = df.filter(expr("trunc(d, 'month') = DATE '1998-12-01'"))
    assert(m.count() == 1L)
    assert(!m.queryExecution.optimizedPlan.toString.contains("trunc("))
    // misaligned literal: unrewritten (and still correct: no match)
    val bad = df.filter(expr("trunc(d, 'month') = DATE '1998-12-02'"))
    assert(bad.queryExecution.optimizedPlan.toString.contains("trunc("))
    assert(bad.count() == 0L)
    // trunc year, aligned
    val ty = df.filter(expr("trunc(d, 'year') = DATE '1998-01-01'"))
    assert(ty.count() == 3L)
    assert(!ty.queryExecution.optimizedPlan.toString.contains("trunc("))
    // year(timestamp) rewrites THROUGH the analyzer's cast-to-date
    // (the zone stays inside the cast) — still row-correct
    val tdir = dir + "-ts"
    Seq(Tuple1(java.sql.Timestamp.valueOf("1998-06-01 12:00:00")),
      Tuple1(java.sql.Timestamp.valueOf("1997-12-31 23:59:59")))
      .toDF("t").write.parquet(tdir)
    val tq = spark.read.parquet(tdir).filter(expr("year(t) = 1998"))
    assert(tq.count() == 1L)
    assert(!tq.queryExecution.optimizedPlan.toString.contains("year("))
  }

  test("holtWinters: hand three-state recursion at period 2; " +
    "non-dyadic delta raises") {
    import graft.operators.Timeseries
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L))
      .toDF("g", "t", "y")
    val r = Timeseries.holtWinters(df, "g", "t", "y",
      0.5, 0.25, 0.25, period = 2)
      .orderBy("t").select("level", "trend", "season")
      .as[(Double, Double, Double)].collect().toSeq
    // t1: seed (10, 0), season slot0 = 0
    // t2 slot1: l=15, b=1.25, s1=1.25
    // t3 slot0: l=23.125, b=2.96875, s0=1.71875
    assert(r == Seq((10.0, 0.0, 0.0), (15.0, 1.25, 1.25),
      (23.125, 2.96875, 1.71875)))
    val e = intercept[IllegalArgumentException](
      Timeseries.holtWinters(df, "g", "t", "y", 0.5, 0.25, 0.3, 2))
    assert(e.getMessage.contains("dyadic"))
  }

  test("siegelSlope: breakdown beyond Theil-Sen — one wild point " +
    "cannot move the repeated median off a clean line") {
    import graft.operators.Timeseries
    // days 1..5 on y = 2x, day 5 wildly corrupted (y = 1000)
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
    val clean = (1 to 4).map(i => ("k", ts(i), 2.0 * i))
    val df = (clean :+ (("k", ts(5), 1000.0))).toDF("g", "t", "v")
    val r = Timeseries.siegelSlope(df, "g", "t", "v").collect()(0)
    assert(r.getLong(1) == 5L)
    // per clean point, the median of its 4 slopes is 2.0 (3 clean
    // slopes of 2.0 vs 1 wild); the wild point's median is wild —
    // the outer median over {2,2,2,2,wild} is 2.0
    assert(r.getDouble(2) == 2.0)
  }

  test("benjaminiYekutieli: threshold is BH's over c(m); rejections " +
    "are a subset of BH's at the same alpha") {
    import graft.operators.Robust
    val tests = Seq(("a", 0.01), ("b", 0.02), ("c", 0.04), ("d", 0.9))
      .toDF("id", "p")
    val bh = Robust.benjaminiHochberg(tests, "p", 0.2, Seq("id"))
      .filter(col("rejected")).select("id").as[String].collect().toSet
    val by = Robust.benjaminiYekutieli(tests, "p", 0.2, Seq("id"))
    val byR = by.filter(col("rejected")).select("id")
      .as[String].collect().toSet
    assert(byR.subsetOf(bh))
    // m=4: c = 1 + 1/2 + 1/3 + 1/4 (exact double chain); rank-1
    // threshold = 0.2/(4*c)
    val c = ((1.0 + 1.0 / 2.0) + 1.0 / 3.0) + 1.0 / 4.0
    val t1 = by.filter(col("bh_rank") === 1L)
      .select("by_threshold").as[Double].collect()(0)
    assert(t1 == (1.0 * 0.2) / (4.0 * c))
    // 0.01 <= 0.024...: rank 1 rejected under BY too
    assert(byR.contains("a"))
  }

  test("holm vs hochberg: shared thresholds, step direction differs " +
    "— the classic (0.06, 0.08) case splits them") {
    import graft.operators.Robust
    // alpha 0.1, m=2: thresholds 0.05 (rank 1), 0.1 (rank 2)
    val tests = Seq(("a", 0.06), ("b", 0.08)).toDF("id", "p")
    val h = Robust.holm(tests, "p", 0.1, Seq("id"))
      .filter(col("rejected")).count()
    assert(h == 0L) // step-down: rank 1 fails, everything stops
    val hb = Robust.hochberg(tests, "p", 0.1, Seq("id"))
      .filter(col("rejected")).select("id").as[String].collect().toSet
    assert(hb == Set("a", "b")) // step-up: rank 2 passes, both reject
    // all-pass case: both gates agree
    val easy = Seq(("a", 0.01), ("b", 0.02), ("c", 0.04), ("d", 0.9))
      .toDF("id", "p")
    val he = Robust.holm(easy, "p", 0.2, Seq("id"))
      .filter(col("rejected")).select("id").as[String].collect().toSet
    val he2 = Robust.hochberg(easy, "p", 0.2, Seq("id"))
      .filter(col("rejected")).select("id").as[String].collect().toSet
    assert(he == Set("a", "b", "c") && he2 == he)
  }

  test("maxDrawdown: peak/trough hand series; first trough wins; " +
    "duplicate order raises") {
    import graft.operators.Timeseries
    // 10, 7, 12, 5, 9, 5: peaks 10,10,12,12,12,12; dd 0,3,0,7,3,7
    // max dd 7, FIRST trough at t=4
    val df = Seq(("k", 1L, 10L), ("k", 2L, 7L), ("k", 3L, 12L),
      ("k", 4L, 5L), ("k", 5L, 9L), ("k", 6L, 5L)).toDF("g", "t", "y")
    val r = Timeseries.maxDrawdown(df, "g", "t", "y").collect()(0)
    assert(r.getLong(1) == 6L && r.getLong(2) == 12L
      && r.getLong(3) == 7L && r.getLong(4) == 4L)
    val dup = Seq(("k", 1L, 1L), ("k", 1L, 2L)).toDF("g", "t", "y")
    val e = intercept[Exception](
      Timeseries.maxDrawdown(dup, "g", "t", "y").collect())
    assert(e.getMessage.contains("duplicate (key, order)"))
  }
}
