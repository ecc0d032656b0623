package graft

import org.apache.spark.sql.functions._

/** Round-15: the r14 ADVICE hardening set (view-safe tag names in the
  * lake SQL surface, retained-version-intersected tail reporting,
  * vacuum's restore-before-sweep of orphaned manifest trash), plus the
  * round's new surfaces specced beside their queries. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"r15_$tag").toString

  private def twoVersionLake(root: String): Unit = {
    import graft.incremental.Snapshots
    (0L until 40L).map(k => (k, s"payload-$k")).toDF("k", "v")
      .coalesce(2).write.parquet(root)
    Snapshots.commit(spark, root) // v1
    (40L until 60L).map(k => (k, s"payload-$k")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v2
  }

  // ---------------------------------------------------------------
  // registerLake — dotted/dashed tags must register (r14 ADVICE #1)
  // ---------------------------------------------------------------

  test("registerLake sanitizes dotted/dashed tag names into view-safe " +
    "identifiers; colliding sanitized names raise loudly") {
    import graft.incremental.Snapshots
    val root = tmp("dottag") + "/lake"
    twoVersionLake(root)
    Snapshots.tag(spark, root, "rel.1", 1L)
    Snapshots.tag(spark, root, "audit-2024", 2L)
    graft.sql.SqlCatalog.registerLake(spark, root, "dotlake")
    assert(spark.sql("SELECT count(*) AS n FROM dotlake_at_rel_1")
      .head().getLong(0) == 40L)
    assert(spark.sql("SELECT count(*) AS n FROM dotlake_at_audit_2024")
      .head().getLong(0) == 60L)
    // a second tag that sanitizes to the same view name must refuse
    Snapshots.tag(spark, root, "rel-1", 2L)
    val refused =
      try { graft.sql.SqlCatalog.registerLake(spark, root, "dotlake"); false }
      catch { case _: IllegalArgumentException => true }
    assert(refused, "colliding sanitized tag names must raise")
  }

  // ---------------------------------------------------------------
  // registerLakeTail — pending ∩ retained (r14 ADVICE #2)
  // ---------------------------------------------------------------

  test("registerLakeTail reports only RETAINED pending versions after " +
    "expire (never expired/nonexistent ones)") {
    import graft.incremental.Snapshots
    val base = tmp("tailexp")
    val root = s"$base/lake"; val cursor = s"$base/cursor"
    twoVersionLake(root)
    (60L until 70L).map(k => (k, s"payload-$k")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v3
    Snapshots.expire(spark, root, keepLast = 1) // drops v1, v2
    val pending = graft.sql.SqlCatalog.registerLakeTail(
      spark, root, cursor, "tail_exp_view")
    assert(pending == Seq(3L),
      s"expired versions must not be reported pending, got $pending")
    // the fresh-consumer view reads the head's full content
    assert(spark.sql("SELECT count(*) FROM tail_exp_view")
      .head().getLong(0) == 70L)
  }

  // ---------------------------------------------------------------
  // vacuum — restore orphaned .trash manifests (r14 ADVICE #3)
  // ---------------------------------------------------------------

  test("vacuum restores a .trash-* manifest whose visible twin is " +
    "missing (crash between the overwrite renames) instead of " +
    "sweeping it — and never deletes that version's files") {
    import graft.incremental.Snapshots
    import org.apache.hadoop.fs.Path
    val root = tmp("trashfix") + "/lake"
    (0L until 40L).map(k => (k, s"payload-$k")).toDF("k", "v")
      .coalesce(2).write.parquet(root)
    Snapshots.commit(spark, root) // v1
    // v2 is a compaction: v1's originals are referenced by v1 ONLY,
    // so losing v1's manifest would make them vacuum-eligible — the
    // exact permanent-loss window the repair closes
    Snapshots.compact(spark, root, targetBytes = 1L << 26) // v2
    val v1Files = Snapshots.pinnedFiles(spark, root, 1L)
    assert(Snapshots.pinnedFiles(spark, root, 2L)
      .intersect(v1Files).isEmpty)
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: v=1's manifest renamed aside, the
    // replacement never renamed in
    val snapDir = new Path(s"$root/_graft_snapshots/v=1")
    val trash = new Path(s"$root/_graft_snapshots/.trash-v=1-deadbeef")
    assert(fs.rename(snapDir, trash))
    assert(Snapshots.versions(spark, root).count() == 1L,
      "the orphaned manifest must be invisible pre-repair")
    val swept = Snapshots.vacuum(spark, root)
    // restored: v1 visible again, its exclusive files untouched
    assert(Snapshots.versions(spark, root).collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    v1Files.foreach(f => assert(fs.exists(new Path(f)),
      s"vacuum deleted $f out from under the restored manifest"))
    assert(Snapshots.readVersion(spark, root, 1L).count() == 40L)
    assert(swept.isEmpty,
      s"every file is referenced post-repair, yet swept $swept")
    assert(!fs.exists(trash), "the restored trash dir must be gone")
  }
}
