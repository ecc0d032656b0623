package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot log + time travel over a plain parquet lake — the
  * Delta/Iceberg version-pinning idea at its minimum honest size: a
  * snapshot is the LIST OF DATA FILES visible at commit time,
  * persisted as a tiny parquet table under
  * `_graft_snapshots/v=N` (a `_`-prefixed directory, invisible to
  * data scans, the [[graft.sources.Tables.writeManifest]] rule).
  * Readers pin a version and see exactly that file set forever —
  * append-only writers never disturb them — which is what makes
  * reproducible training runs, "what did the model see?" audits, and
  * safe concurrent append+read possible on an object store.
  *
  * Commit protocol: version N+1 becomes VISIBLE only when its
  * directory's write completes (Spark stages to `_temporary` and
  * renames, so a crashed commit leaves no readable version — the
  * discovery listing requires the committed `_SUCCESS`-bearing dir to
  * parse). Snapshots are file-count-scale metadata: commit cost is
  * one listing + one metadata write; readVersion cost is one metadata
  * read + the pinned scan. Retention: [[unreferencedFiles]] lists
  * data files no retained snapshot references — the ONLY files a
  * vacuum may delete (deleting anything else breaks time travel, so
  * the sweep is exact, not heuristic).
  */
object Snapshots {

  private def snapRoot(path: String) = s"$path/_graft_snapshots"

  private def hconf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  /** Driver-side pin-list read — snapshot metadata costs ZERO Spark
    * jobs ([[SnapshotIo]], round-13): the log is file-count-scale, and
    * commit/branch/merge cycles were paying a full job of scheduler
    * overhead per few-hundred-row lookup. */
  private def readPins(spark: SparkSession, dir: String): Seq[String] =
    SnapshotIo.readStrings(hconf(spark), dir, "path")

  private def listVersions(spark: SparkSession, path: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(snapRoot(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=") }
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted
  }

  private def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(root).toString
    val it = fs.listFiles(root, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val full = f.getPath.toString
      val rel = full.stripPrefix(rootUri).stripPrefix("/")
      val hidden = rel.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (f.isFile && full.endsWith(".parquet") && !hidden)
        files += full
    }
    files.sorted.toSeq
  }

  /** Commit the CURRENT data-file set as the next version. Returns the
    * new version number (1-based). Re-committing an unchanged lake
    * creates a new version with the same file list — versions are
    * commit events, not content hashes (matching Delta's behavior).
    *
    * SUPERSEDED files are excluded: a file referenced by SOME snapshot
    * but absent from the LATEST one was removed from the live table by
    * a prior commit (a [[compact]] rewrote it away) and survives on
    * disk only as time-travel history — re-pinning it would duplicate
    * its rows against its compacted replacement. A file referenced by
    * NO snapshot is a fresh append and joins the pin; a file in the
    * latest snapshot stays. So plain append-then-commit composes with
    * compaction with no caller changes. Cost: one metadata read over
    * the snapshot log (file-count × version-count rows). */
  def commit(spark: SparkSession, path: String): Long = {
    val v = listVersions(spark, path).lastOption.getOrElse(0L) + 1L
    writeSnapshot(spark, path, v, livePin(spark, path), overwrite = false)
    autoAnalyze(spark, path, v)
    autoManifest(spark, path)
    v
  }

  /** The live file set a plain commit pins: every data file on disk
    * EXCEPT superseded history (see [[commit]]'s scaladoc). */
  private def livePin(spark: SparkSession, path: String): Seq[String] = {
    val vs = listVersions(spark, path)
    val all = listDataFiles(spark, path)
    if (vs.isEmpty) all
    else {
      val ever = vs.flatMap(x =>
        readPins(spark, s"${snapRoot(path)}/v=$x")).toSet
      val latest =
        readPins(spark, s"${snapRoot(path)}/v=${vs.last}").toSet
      all.filter(f => latest.contains(f) || !ever.contains(f))
    }
  }

  /** OPTIMISTIC CONCURRENCY for append-only commits (round-15,
    * VERDICT r14 #6): [[SnapshotIo]]'s ErrorIfExists guard makes the
    * LOSER of a concurrent commit FAIL — correct (no version is ever
    * clobbered) but harsh: on a 100 TB lake with many ingest writers
    * the loser should RETRY, Iceberg-style — re-list the log, re-pin
    * the live set (which now includes the winner's files, because a
    * listing commit pins everything staged), and commit the next
    * version. Append-only commits never truly conflict: both writers'
    * batches are on disk, so the retried pin is the union and nothing
    * is lost. True conflicts stay loud — the single-maintenance-writer
    * ops (compaction, purge, expire) and [[mergeBranch]]'s fork rule
    * are unchanged, and any non-race failure propagates immediately.
    *
    * `beforeWrite` is the deterministic-race test seam: invoked with
    * the chosen version AFTER the log re-list and BEFORE the manifest
    * write — a spec injects the competing winner there. Returns the
    * version that finally landed; raises after `maxAttempts` straight
    * losses (pathological contention should surface, not spin). */
  def commitRetry(spark: SparkSession, path: String,
                  maxAttempts: Int = 5,
                  beforeWrite: Long => Unit = _ => ()): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var lastErr: Throwable = null
    (1 to maxAttempts).foreach { _ =>
      val v = listVersions(spark, path).lastOption.getOrElse(0L) + 1L
      beforeWrite(v)
      try {
        writeSnapshot(spark, path, v, livePin(spark, path),
          overwrite = false)
        autoAnalyze(spark, path, v)
        autoManifest(spark, path)
        return v
      } catch {
        case e: IllegalStateException if e.getMessage != null &&
            e.getMessage.contains("commit race") => lastErr = e
      }
    }
    throw new IllegalStateException(
      s"commitRetry at $path: lost the commit race $maxAttempts " +
        "times — pathological contention, back off and retry", lastErr)
  }

  /** [[commit]] with a CALLER-CHOSEN version id and overwrite
    * semantics — the streaming form
    * ([[graft.streaming.Streaming.snapshotIngestSink]] derives
    * v = batchId + 1 from the checkpointed batch id, so a
    * crash-REPLAYED batch re-commits ITS OWN version with the
    * re-listed file set instead of appending a content-equal extra
    * one — replay-stable history, the
    * [[graft.incremental.Deletes.upsertAt]] discipline). Raises when
    * `version` would break monotonicity against versions OTHER than
    * itself (an out-of-order commit would rewrite history a later
    * version already built on). */
  def commitAt(spark: SparkSession, path: String, version: Long): Unit = {
    require(version >= 1, s"versions are 1-based, got $version")
    val others = listVersions(spark, path).filter(_ != version)
    require(others.forall(_ < version),
      s"version $version is not the frontier — existing: ${others.sorted}")
    writeSnapshot(spark, path, version, livePin(spark, path),
      overwrite = true)
    autoAnalyze(spark, path, version)
    autoManifest(spark, path)
  }

  private def writeSnapshot(spark: SparkSession, path: String, v: Long,
                            files: Seq[String], overwrite: Boolean): Unit =
    SnapshotIo.writeStrings(hconf(spark), s"${snapRoot(path)}/v=$v",
      "path", files, overwrite)

  /** RESTORE as a new commit (round-15, Delta's `RESTORE TABLE ...
    * VERSION AS OF` — the NON-destructive sibling of [[rollback]],
    * which truncates the log): the head moves to a NEW version
    * pinning exactly `toVersion`'s file set — zero data I/O (a
    * pin-list copy), full history preserved (the undone versions
    * stay time-travelable until [[expire]]), and every downstream
    * surface (tags, SQL views, [[consumeTail]], [[changesBetween]])
    * sees an ordinary commit. Stats sketches copy forward from
    * `toVersion` (identical content ⇒ identical sketches, zero
    * scan); the zone-map manifest refreshes if declared. A later
    * plain [[commit]] does NOT resurrect the undone files:
    * [[livePin]] treats every ever-pinned file outside the latest
    * pin as superseded history. Returns the new version. */
  def restore(spark: SparkSession, path: String,
              toVersion: Long): Long = {
    val vs = listVersions(spark, path)
    require(vs.contains(toVersion),
      s"version $toVersion not in the log — existing: ${vs.sorted}")
    val v = vs.last + 1
    writeSnapshot(spark, path, v,
      readPins(spark, s"${snapRoot(path)}/v=$toVersion"),
      overwrite = false)
    copyStatsForward(spark, path, toVersion, v)
    autoManifest(spark, path)
    v
  }

  /** CHANGE DATA FEED between two versions (round-15) — the
    * snapshot-lake incremental read, Iceberg's contract extended one
    * step: walk each commit in `(fromVersion, toVersion]`
    * (`fromVersion = 0` = table inception, an empty base) and emit
    * appended files' rows as `_change_type = 'insert'` and dropped
    * files' rows as `'delete'`, each stamped `_commit_version`. I/O
    * is O(changed files) — a consumer pays for the delta, never the
    * corpus (the [[consumeTail]] economics, with the delete side
    * added: a [[restore]] commit surfaces as deletes of exactly the
    * restored-away rows). A commit that BOTH adds and drops files is a
    * rewrite (purge, compaction) whose file diff over-reports
    * unchanged rows — it raises loudly; route those ranges to the
    * content diff ([[graft.operators.Diff.toCdcFeed]] /
    * `Deletes.cdcBetween`), which is honest about being
    * corpus-scale. */
  def changesBetween(spark: SparkSession, path: String,
                     fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"changesBetween needs fromVersion < toVersion, got " +
        s"$fromVersion >= $toVersion")
    val all = listVersions(spark, path)
    val vs = all.filter(v => v > fromVersion && v <= toVersion)
    require(vs.nonEmpty, s"no versions in ($fromVersion, $toVersion]")
    // fromVersion = 0 streams from table INCEPTION (empty base —
    // the Delta/Iceberg starting-version contract); any other
    // fromVersion must itself be a retained snapshot
    require(fromVersion == 0L || all.contains(fromVersion),
      s"fromVersion $fromVersion is not a retained snapshot " +
        s"(existing: ${all.sorted}); use 0 to stream from inception")
    // each version's pins read exactly ONCE (a k-commit range costs
    // k+1 manifest reads and one log listing, not 2k of each — the
    // object-store metadata latency an incremental poll pays for)
    val chain = fromVersion +: vs
    val pins: Map[Long, Seq[String]] = chain.map { v =>
      v -> (if (v == 0L) Seq.empty
            else readPins(spark, s"${snapRoot(path)}/v=$v"))
    }.toMap
    val slices = chain.sliding(2).toSeq.flatMap { case Seq(prev, v) =>
      val from = pins(prev).toSet
      val to = pins(v)
      val added = to.filterNot(from)
      val dropped = (from -- to.toSet).toSeq.sorted
      require(added.isEmpty || dropped.isEmpty,
        s"commit v$v both adds ${added.size} and drops " +
          s"${dropped.size} file(s) — a rewrite crossed the range; " +
          "use a content diff (Diff.toCdcFeed) for rewrite commits")
      val (files, kind) =
        if (added.nonEmpty) (added, "insert") else (dropped, "delete")
      if (files.isEmpty) None
      else Some(spark.read.parquet(files: _*)
        .withColumn("_change_type", lit(kind))
        .withColumn("_commit_version", lit(v)))
    }
    require(slices.nonEmpty,
      s"every commit in ($fromVersion, $toVersion] is a no-op")
    slices.reduce(_ unionByName _)
  }

  private def tagRoot(path: String) = s"${snapRoot(path)}/tags"

  private def listTags(spark: SparkSession,
                       path: String): Seq[(String, Long)] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tagRoot(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      // `.tmp-*`/`.trash-*` staging siblings of a crashed tag write
      // are not tags (ref names are [A-Za-z0-9._-] and never start
      // with a dot by the writeAtomic naming scheme)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .map { n =>
        val v = SnapshotIo.readLongs(hconf(spark),
          s"${tagRoot(path)}/$n", "version").head
        (n, v)
      }.sortBy(_._1)
  }

  /** Create or move a NAMED REF to a committed version — the Iceberg
    * tag: a human-meaningful pin ("training-run-2024-06",
    * "audit-baseline") that survives log retention. [[expire]] never
    * drops a tagged version (so [[vacuum]] never sweeps its files) —
    * the reproducible-training-run contract: data a tag references
    * stays bit-stable until the tag itself is dropped. Re-tagging an
    * existing name moves it (create-or-replace, the Iceberg
    * behavior). Tag storage is one tiny parquet per name under the
    * snapshot root — metadata-scale, invisible to data scans. Raises
    * on an uncommitted version (a tag must always resolve). Names are
    * restricted to `[A-Za-z0-9._-]` so the tag IS its directory name
    * on every filesystem. */
  def tag(spark: SparkSession, path: String, name: String,
          version: Long): Unit = {
    require(name.nonEmpty && name.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"tag name must be [A-Za-z0-9._-], got '$name'")
    require(listVersions(spark, path).contains(version),
      s"cannot tag uncommitted version $version at $path — versions: " +
        listVersions(spark, path).mkString(", "))
    SnapshotIo.writeLongs(hconf(spark), s"${tagRoot(path)}/$name",
      "version", Seq(version), overwrite = true)
  }

  /** The tag registry: (tag, version), tag-name ascending. */
  def tags(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      listTags(spark, path).map { case (n, v) =>
        org.apache.spark.sql.Row(n, java.lang.Long.valueOf(v)) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** [[readVersion]] through a named ref. Raises on an unknown tag. */
  def readTag(spark: SparkSession, path: String, name: String): DataFrame = {
    val t = listTags(spark, path).collectFirst { case (n, v) if n == name => v }
      .getOrElse(throw new IllegalArgumentException(
        s"no tag '$name' at $path — tags: " +
          listTags(spark, path).map(_._1).mkString(", ")))
    readVersion(spark, path, t)
  }

  /** Drop a named ref — after this the tagged version is ordinary
    * history ([[expire]]-able, then [[vacuum]]-able). Raises on an
    * unknown tag (dropping nothing silently hides a typo'd cleanup). */
  def dropTag(spark: SparkSession, path: String, name: String): Unit = {
    import org.apache.hadoop.fs.Path
    require(listTags(spark, path).exists(_._1 == name),
      s"no tag '$name' at $path — tags: " +
        listTags(spark, path).map(_._1).mkString(", "))
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"${tagRoot(path)}/$name"), true)
  }

  /** The exact file list a version pins — the metadata unit
    * composed readers build on ([[graft.sources.Tables.metadataAgg]]
    * answers aggregates AS OF a version from these files' footers
    * without touching data pages). Raises on an unknown version. */
  def pinnedFiles(spark: SparkSession, path: String,
                  version: Long): Seq[String] = {
    require(listVersions(spark, path).contains(version),
      s"no snapshot v=$version at $path — versions: " +
        listVersions(spark, path).mkString(", "))
    readPins(spark, s"${snapRoot(path)}/v=$version").sorted
  }

  // ----------------------------------------------------------------
  // Branches — isolated writable refs (the WAP substrate)
  // ----------------------------------------------------------------

  private def branchRoot(path: String, name: String) =
    s"${snapRoot(path)}/branches/$name"

  private def requireRefName(name: String): Unit =
    require(name.nonEmpty && name.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"ref name must be [A-Za-z0-9._-], got '$name'")

  private def listBranchNames(spark: SparkSession,
                              path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"${snapRoot(path)}/branches")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .sorted
  }

  private def branchFork(spark: SparkSession, path: String,
                         name: String): Long =
    SnapshotIo.readLongs(hconf(spark),
      s"${branchRoot(path, name)}/meta", "fork_version").head

  private def branchVersionList(spark: SparkSession, path: String,
                                name: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(branchRoot(path, name))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=") }
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted
  }

  /** Fork an isolated WRITABLE ref off a committed main version — the
    * Iceberg branch, and the substrate of the write-audit-publish
    * (WAP) pattern: stage risky writes on a branch, audit them there,
    * and only [[mergeBranch]] (publish) makes them visible to main
    * readers — who, until then, CANNOT observe the staged data even
    * by accident, because branch data files live under a
    * `_`-prefixed directory that every directory scan and every main
    * pin listing skips by the hidden-file rule. Branch state is
    * snapshot-metadata scale: a pin list per branch version plus one
    * fork-version meta row. The fork version becomes
    * retention-exempt while the branch lives ([[expire]]) and
    * [[rollback]] below it raises — a branch must always resolve. */
  def createBranch(spark: SparkSession, path: String, name: String,
                   fromVersion: Long): Unit = {
    requireRefName(name)
    require(listVersions(spark, path).contains(fromVersion),
      s"cannot branch off uncommitted version $fromVersion — versions: " +
        listVersions(spark, path).mkString(", "))
    require(!listBranchNames(spark, path).contains(name),
      s"branch '$name' already exists at $path")
    SnapshotIo.writeLongs(hconf(spark),
      s"${branchRoot(path, name)}/meta", "fork_version",
      Seq(fromVersion), overwrite = false)
    writeRefSnapshot(spark, branchRoot(path, name), 1L,
      pinnedFiles(spark, path, fromVersion))
  }

  private def writeRefSnapshot(spark: SparkSession, refRoot: String,
                               v: Long, files: Seq[String]): Unit =
    SnapshotIo.writeStrings(hconf(spark), s"$refRoot/v=$v", "path",
      files, overwrite = false)

  /** Append a batch to a branch: the files land under the hidden
    * `_branch-<name>/` staging area (invisible to main scans and
    * pins), and the branch's next version pins previous + new.
    * Returns the new branch version. */
  def appendBranch(spark: SparkSession, path: String, name: String,
                   df: DataFrame): Long = {
    require(listBranchNames(spark, path).contains(name),
      s"no branch '$name' at $path — branches: " +
        listBranchNames(spark, path).mkString(", "))
    val vs = branchVersionList(spark, path, name)
    val v = vs.last + 1
    val stage = s"$path/_branch-$name/b-$v"
    df.write.parquet(stage)
    val prev = readPins(spark, s"${branchRoot(path, name)}/v=${vs.last}")
    writeRefSnapshot(spark, branchRoot(path, name), v,
      (prev ++ listDataFilesIncludingHidden(spark, stage)).sorted)
    v
  }

  /** Like [[listDataFiles]] but WITHOUT the hidden-segment filter
    * below `root` — used for branch staging dirs, whose whole point
    * is being `_`-hidden from main. */
  private def listDataFilesIncludingHidden(spark: SparkSession,
                                           root: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val base = f.getPath.getName
      if (f.isFile && f.getPath.toString.endsWith(".parquet") &&
          !base.startsWith("_") && !base.startsWith("."))
        files += f.getPath.toString
    }
    files.sorted.toSeq
  }

  /** The branch head as a frame (explicit pinned files — the staging
    * area's hidden-ness never matters to an explicit-path read). */
  def readBranch(spark: SparkSession, path: String,
                 name: String): DataFrame = {
    require(listBranchNames(spark, path).contains(name),
      s"no branch '$name' at $path — branches: " +
        listBranchNames(spark, path).mkString(", "))
    val vs = branchVersionList(spark, path, name)
    val files =
      readPins(spark, s"${branchRoot(path, name)}/v=${vs.last}").sorted
    if (files.isEmpty) {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(path).schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** The branch registry: (branch, fork_version, n_versions). */
  def branches(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = listBranchNames(spark, path).map { n =>
      org.apache.spark.sql.Row(n,
        java.lang.Long.valueOf(branchFork(spark, path, n)),
        java.lang.Long.valueOf(branchVersionList(spark, path, n).size.toLong))
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("branch",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("fork_version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_versions",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** PUBLISH: fast-forward the branch into main as the next main
    * version. Requires main's head to still be the branch's fork
    * version (main advanced → raise; rebase is not offered — re-stage
    * on a fresh branch instead, the append-only discipline). The
    * branch's staged files RENAME (a metadata move, not a copy) into
    * the visible `merge-v<N+1>/` directory (or `merge-<tag>-v<N+1>/`
    * when `mergeTag` is given — the WAP replay fence: the publishing
    * SNAPSHOT then carries the tag in its pinned paths, so "was batch
    * b published?" is answerable from the atomic commit record itself,
    * never from a separate marker a crash could miss) so the published
    * version, like every other, is discoverable by the plain
    * listing-based [[commit]] afterwards; the branch refs are then
    * dropped. A crash
    * mid-rename leaves renamed files unreferenced (next [[vacuum]]
    * sweeps them) and the branch intact minus some staged files — the
    * one maintenance op here that is re-stageable rather than
    * replayable, documented trade-off. */
  def mergeBranch(spark: SparkSession, path: String,
                  name: String, mergeTag: Option[String] = None): Long = {
    import org.apache.hadoop.fs.Path
    require(listBranchNames(spark, path).contains(name),
      s"no branch '$name' at $path")
    mergeTag.foreach(t => require(t.nonEmpty && !t.contains("/") &&
      !t.contains("-v"), s"mergeTag must be a plain dir token, got '$t'"))
    val fork = branchFork(spark, path, name)
    val mainHead = listVersions(spark, path).last
    require(mainHead == fork,
      s"main advanced to v$mainHead past the fork v$fork — merge would " +
        "drop main's newer commits; re-stage on a fresh branch")
    val vs = branchVersionList(spark, path, name)
    val head = readPins(spark, s"${branchRoot(path, name)}/v=${vs.last}")
    val forkPins = pinnedFiles(spark, path, fork).toSet
    val staged = head.filterNot(forkPins)
    val v = mainHead + 1
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val destDir = new Path(
      mergeTag.fold(s"$path/merge-v$v")(t => s"$path/merge-$t-v$v"))
    fs.mkdirs(destDir)
    val moved = staged.map { f =>
      val dest = new Path(destDir, new Path(f).getName)
      require(fs.rename(new Path(f), dest),
        s"mergeBranch: rename failed for $f")
      dest.toString
    }
    writeSnapshot(spark, path, v,
      (forkPins.toSeq ++ moved.map(m =>
        fs.makeQualified(new Path(m)).toString)).sorted,
      overwrite = false)
    fs.delete(new Path(branchRoot(path, name)), true)
    fs.delete(new Path(s"$path/_branch-$name"), true)
    v
  }

  /** Every file path pinned by ANY retained main version — one
    * metadata read over the whole snapshot log (file-count ×
    * version-count rows). The WAP publish fence
    * ([[graft.streaming.Streaming.wapBatch]]) greps this for its
    * batch-tagged merge directory. Empty lake -> empty. */
  def allPinnedPaths(spark: SparkSession, path: String): Seq[String] = {
    listVersions(spark, path)
      .flatMap(x => readPins(spark, s"${snapRoot(path)}/v=$x"))
      .distinct
  }

  /** The branch head's STAGED files — those its fork version does not
    * pin (metadata-scale: two snapshot reads). What [[mergeBranch]]
    * would move; lets a caller detect an effectively-empty branch
    * (an empty staged batch writes zero part files) before minting a
    * content-identical main version. */
  def stagedFiles(spark: SparkSession, path: String,
                  name: String): Seq[String] = {
    require(listBranchNames(spark, path).contains(name),
      s"no branch '$name' at $path")
    val fork = branchFork(spark, path, name)
    val vs = branchVersionList(spark, path, name)
    val head = readPins(spark, s"${branchRoot(path, name)}/v=${vs.last}")
    val forkPins = pinnedFiles(spark, path, fork).toSet
    head.filterNot(forkPins).sorted
  }

  /** Abandon a branch: refs AND its hidden staged data are deleted
    * (staged files are invisible to [[vacuum]] by the hidden rule, so
    * the eager delete is what reclaims them). Main is untouched —
    * the audit-failed half of WAP. */
  def dropBranch(spark: SparkSession, path: String,
                 name: String): Unit = {
    import org.apache.hadoop.fs.Path
    require(listBranchNames(spark, path).contains(name),
      s"no branch '$name' at $path — branches: " +
        listBranchNames(spark, path).mkString(", "))
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(branchRoot(path, name)), true)
    fs.delete(new Path(s"$path/_branch-$name"), true)
  }

  /** INCREMENTAL scan: the rows that ENTERED the lake between two
    * committed versions — exactly the files `toVersion` pins that
    * `fromVersion` didn't (the Iceberg incremental-append-scan
    * shape): a downstream consumer reads each version range once and
    * never rescans history, the O(delta) consumption pattern that
    * keeps a 100 TB lake's consumers linear in ARRIVALS, not in lake
    * size. Sound ONLY across append-only history: if `fromVersion`
    * pins a file that `toVersion` dropped, a rewrite (compaction /
    * upsert fold) crossed the range and the file diff no longer
    * means "new rows" — raises loudly (Iceberg's incremental scan
    * refuses non-append snapshots the same way; diff CONTENT across
    * rewrites with [[graft.incremental.Deletes.cdcBetween]] instead).
    * File-set arithmetic is snapshot-metadata scale. An empty delta
    * returns an empty frame with the lake's schema. */
  def addedBetween(spark: SparkSession, path: String,
                   fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"addedBetween needs fromVersion < toVersion, got " +
        s"$fromVersion >= $toVersion")
    val from = pinnedFiles(spark, path, fromVersion).toSet
    val to = pinnedFiles(spark, path, toVersion)
    val dropped = from -- to.toSet
    require(dropped.isEmpty,
      s"addedBetween($fromVersion, $toVersion): ${dropped.size} file(s) " +
        s"pinned at v$fromVersion are gone by v$toVersion — a rewrite " +
        "crossed the range; use Deletes.cdcBetween for content diffs")
    val added = to.filterNot(from)
    if (added.isEmpty) {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(path).schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else spark.read.parquet(added: _*)
  }

  /** The version log: (version, n_files), ascending — the audit
    * readout. */
  def versions(spark: SparkSession, path: String): DataFrame = {
    val vs = listVersions(spark, path)
    import scala.jdk.CollectionConverters._
    val rows = vs.map { v =>
      val n = readPins(spark, s"${snapRoot(path)}/v=$v").size.toLong
      org.apache.spark.sql.Row(v, n)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Read the lake AS OF `version`: exactly the files that snapshot
    * pinned, schema pinned from them. Raises on an unknown version
    * (asking for history that does not exist is a caller bug, not an
    * empty frame). An empty pinned set returns an empty frame with
    * the LIVE table's schema. */
  def readVersion(spark: SparkSession, path: String,
                  version: Long): DataFrame = {
    require(listVersions(spark, path).contains(version),
      s"no snapshot v=$version at $path — versions: " +
        listVersions(spark, path).mkString(", "))
    val files = readPins(spark, s"${snapRoot(path)}/v=$version").sorted
    if (files.isEmpty) {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(path).schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Pruned TIME TRAVEL — zone-map file skipping composed with the
    * version pin: the box prune's footer pass runs over ONLY the
    * files `version` pins, survivors scan with the PINNED files'
    * schema, and the exact predicate re-applies row-level (the
    * [[graft.sources.Tables.readPrunedBox]] conservative contract,
    * restricted to a snapshot). At 100 TB this is the difference
    * between "time travel" and "time travel you can afford": an
    * as-of-last-month probe on a sorted lake opens the same few
    * files a live probe would, instead of the whole pinned history.
    * Raises on an unknown version. */
  def readVersionPruned(spark: SparkSession, path: String, version: Long,
                        box: Seq[(String, Any, Any)]): DataFrame = {
    val pins = pinnedFiles(spark, path, version)
    graft.sources.Tables.readPrunedBox(spark, path, box,
      onlyFiles = Some(pins))
  }

  // ----------------------------------------------------------------
  // Schema evolution — ADD/DROP-only, recorded per version
  // ----------------------------------------------------------------

  private val schemaSidecar = "_schema.json"

  /** [[commit]] with SCHEMA TRACKING (Iceberg-class evolution, the
    * ADD/DROP-only subset): the commit records the live file set's
    * MERGED schema in a `_schema.json` sidecar written atomically
    * with the pin list (same directory rename — schema and pins are
    * visible together or not at all), after validating against the
    * previous recorded schema that every SHARED column keeps its
    * exact type — a type CHANGE raises (rewrite the data instead;
    * silent widening corrupts readers pinned on the old type), while
    * newly-appearing columns are the sanctioned ADD path. `drop`
    * removes columns from the RECORDED schema without touching data
    * files (the Iceberg drop: old files keep the bytes, readers stop
    * seeing them; a later re-add starts null-backed by files that
    * predate it). Readers: [[readVersionAs]] applies the version's
    * recorded schema, so an old pin shows the OLD shape and a new pin
    * null-fills added columns in pre-evolution files. Plain
    * [[commit]]/[[readVersion]] stay schema-free (file-schema
    * passthrough) — evolution is opt-in per lake; mixing both styles
    * on one lake is supported ([[readVersionAs]] falls back to the
    * files' merged schema when a version predates tracking). */
  def commitEvolving(spark: SparkSession, path: String,
                     drop: Seq[String] = Nil): Long = {
    val v = listVersions(spark, path).lastOption.getOrElse(0L) + 1L
    val files = livePin(spark, path)
    require(files.nonEmpty,
      s"commitEvolving at $path: no live data files to derive a " +
        "schema from — write the first batch before the first commit")
    val merged =
      try spark.read.option("mergeSchema", "true")
        .parquet(files: _*).schema
      catch { case e: org.apache.spark.SparkException =>
        throw new IllegalArgumentException(
          s"commitEvolving at $path: the live files' schemas do not " +
            s"merge — a column changed type across batches (only " +
            s"ADD/DROP evolve; rewrite for type changes): ${e.getMessage}")
      }
    schemaOf(spark, path, v - 1).foreach { prev =>
      prev.fields.foreach { pf =>
        merged.fields.find(_.name.equalsIgnoreCase(pf.name)).foreach { cf =>
          require(cf.dataType == pf.dataType,
            s"commitEvolving at $path: column '${pf.name}' changed " +
              s"type ${pf.dataType.simpleString} -> " +
              s"${cf.dataType.simpleString} — only ADD/DROP evolve; " +
              "rewrite the data for a type change")
        }
      }
    }
    val dropped = drop.map(_.toLowerCase).toSet
    dropped.foreach(d => require(
      merged.fields.exists(_.name.equalsIgnoreCase(d)),
      s"commitEvolving at $path: cannot drop unknown column '$d' — " +
        s"columns: ${merged.fieldNames.mkString(", ")}"))
    val recorded = org.apache.spark.sql.types.StructType(
      merged.fields.filterNot(f => dropped(f.name.toLowerCase)))
    SnapshotIo.writeStrings(hconf(spark), s"${snapRoot(path)}/v=$v",
      "path", files, overwrite = false,
      sidecar = Some((schemaSidecar, recorded.json)))
    autoAnalyze(spark, path, v)
    autoManifest(spark, path)
    v
  }

  /** The schema a version RECORDED at commit time ([[commitEvolving]])
    * — None for versions committed schema-free. */
  def schemaOf(spark: SparkSession, path: String,
               version: Long): Option[org.apache.spark.sql.types.StructType] =
    SnapshotIo.readSidecar(hconf(spark),
        s"${snapRoot(path)}/v=$version", schemaSidecar)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** [[readVersion]] under the version's RECORDED schema: added
    * columns null-fill in files that predate them, dropped columns
    * disappear even though old files still carry the bytes, and an
    * old pin keeps its old shape forever. All fields read as
    * nullable (a pre-evolution file has no values for an added
    * column — trusting a non-null flag there would let codegen
    * deref a null). Falls back to the pinned files' own merged
    * schema for versions that predate tracking. */
  def readVersionAs(spark: SparkSession, path: String,
                    version: Long): DataFrame = {
    require(listVersions(spark, path).contains(version),
      s"no snapshot v=$version at $path — versions: " +
        listVersions(spark, path).mkString(", "))
    val files = readPins(spark, s"${snapRoot(path)}/v=$version").sorted
    val recorded = schemaOf(spark, path, version).getOrElse {
      if (files.isEmpty)
        spark.read.option("recursiveFileLookup", "true").parquet(path)
          .schema
      else spark.read.option("mergeSchema", "true")
        .parquet(files: _*).schema
    }
    val nullable = org.apache.spark.sql.types.StructType(
      recorded.fields.map(_.copy(nullable = true)))
    if (files.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), nullable)
    else spark.read.schema(nullable).parquet(files.toIndexedSeq: _*)
  }

  /** Lake CLONE / replication export: copy every RETAINED pinned
    * data file plus the whole snapshot log (version manifests with
    * schema sidecars, tags, stats sketches) to a new root, REWRITING
    * the pinned paths — pins are absolute, so a byte copy alone
    * would leave the clone reading (and, worse, vacuuming) the
    * source. The disaster-recovery / environment-promotion op every
    * versioned lake needs. Superseded-but-unpinned files do NOT
    * travel (the clone starts with exactly the retained history;
    * vacuum-eligible garbage stays behind). Live branches must
    * resolve first (their staged pins would dangle); pins outside
    * the source root raise (external-location files are not
    * relocatable by a copy). The clone is fully independent:
    * maintenance there (compact/expire/vacuum/purge) never touches
    * the source. Cost: one file copy per retained file +
    * metadata-scale manifest rewrites. */
  def cloneLake(spark: SparkSession, src: String, dst: String): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = hconf(spark)
    val vs = listVersions(spark, src)
    require(vs.nonEmpty, s"cloneLake: no snapshots at $src — commit first")
    require(listBranchNames(spark, src).isEmpty,
      s"cloneLake at $src: live branches must resolve first")
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf)
    val srcUri = fs.makeQualified(srcPath).toString
    val dstPath = new Path(dst)
    val dfs = dstPath.getFileSystem(conf)
    require(!dfs.exists(dstPath) || dfs.listStatus(dstPath).isEmpty,
      s"cloneLake: destination $dst is not empty")
    val dstUri = dfs.makeQualified(dstPath).toString
    val pinsByV = vs.map(v => v -> readPins(spark, s"${snapRoot(src)}/v=$v"))
    val files = pinsByV.flatMap(_._2).distinct.sorted
    def rel(p: String): String = {
      val q = fs.makeQualified(new Path(p)).toString
      require(q.startsWith(srcUri + "/"),
        s"cloneLake: pin $p lies outside the source root $srcUri — " +
          "external-location files cannot relocate by copy")
      q.stripPrefix(srcUri + "/")
    }
    files.foreach { f =>
      val r = rel(f)
      FileUtil.copy(fs, new Path(f), dfs, new Path(s"$dst/$r"),
        false, conf)
    }
    pinsByV.foreach { case (v, pins) =>
      val dir = s"${snapRoot(src)}/v=$v"
      val sidecar = SnapshotIo.readSidecar(conf, dir, "_schema.json")
        .map(("_schema.json", _))
      SnapshotIo.writeStrings(conf, s"${snapRoot(dst)}/v=$v", "path",
        pins.map(p => s"$dstUri/${rel(p)}").sorted,
        overwrite = false, sidecar = sidecar)
    }
    // tags + stats ride along (metadata-scale)
    listTags(spark, src).foreach { case (n, v) =>
      SnapshotIo.writeLongs(conf, s"${tagRoot(dst)}/$n", "version",
        Seq(v), overwrite = false)
    }
    val statsRoot = new Path(s"${snapRoot(src)}/stats")
    if (fs.exists(statsRoot))
      FileUtil.copy(fs, statsRoot, dfs,
        new Path(s"${snapRoot(dst)}/stats"), false, conf)
  }

  /** O(delta) snapshot-TAIL consumer — the read side of the
    * produce→maintain→consume loop: process every version committed
    * past the recorded cursor, ONE VERSION PER CALL to `process`
    * (batch id = the version number, so an idempotent processor gets
    * exactly-once semantics), advancing the cursor AFTER each
    * processed version. A crash between process and cursor-advance
    * replays exactly that version (at-least-once; version-keyed
    * overwrite in the processor makes it exactly-once — the
    * [[graft.streaming.Streaming]] sink discipline). Deltas come from
    * [[addedBetween]], so a compaction-crossed range RAISES — the
    * consumer must resync (full [[readLatest]] + cursor reset), never
    * silently double-read rewritten rows. Cost per call: snapshot
    * metadata + the NEW files only — a 100 TB lake's consumers stay
    * linear in arrivals. Returns the versions processed. */
  def consumeTail(spark: SparkSession, path: String, cursorDir: String,
                  process: (DataFrame, Long) => Unit): Seq[Long] = {
    val conf = hconf(spark)
    val cur = SnapshotIo.readLongs(conf, cursorDir, "v")
      .headOption.getOrElse(0L)
    val head = listVersions(spark, path).lastOption.getOrElse(0L)
    val done = scala.collection.mutable.ArrayBuffer.empty[Long]
    (cur + 1 to head).foreach { v =>
      val delta =
        if (v == 1L) readVersion(spark, path, 1L)
        else addedBetween(spark, path, v - 1, v)
      process(delta, v)
      SnapshotIo.writeLongs(conf, cursorDir, "v", Seq(v),
        overwrite = true)
      done += v
    }
    done.toSeq
  }

  // ----------------------------------------------------------------
  // Column statistics catalog (ANALYZE) — per-version NDV sketches
  // ----------------------------------------------------------------

  private def statsDir(path: String, version: Long, colName: String) =
    s"${snapRoot(path)}/stats/v=$version/$colName"

  /** ANALYZE for a snapshot-logged lake: per-column KMV sketches
    * ([[graft.functions.Kmv]], 60-bit md5 hashes, ≤k rows each)
    * computed over exactly the files `version` pins and stored under
    * the snapshot root — the stats catalog a planner (or a human
    * sizing a broadcast) reads instead of re-scanning a 100 TB table
    * to ask "how many distinct join keys?". Deterministic (md5, no
    * rand), so stats are reproducible and re-ANALYZE is idempotent
    * (overwrite). NDV is over NON-NULL values (the SQL convention).
    * Sketches MERGE across versions/partitions (bottom-k of
    * bottom-ks), so incremental stats maintenance needs only the new
    * files' sketches. Column names must be directory-safe
    * `[A-Za-z0-9_]`. Cost: one distinct + bounded heap per column
    * over the pinned scan. */
  def analyze(spark: SparkSession, path: String, version: Long,
              cols: Seq[String], k: Int = 64): Unit = {
    require(cols.nonEmpty, "cols required")
    cols.foreach(c => require(c.nonEmpty && c.forall(ch =>
        ch.isLetterOrDigit || ch == '_'),
      s"column name must be [A-Za-z0-9_] for the stats dir, got '$c'"))
    val df = readVersion(spark, path, version)
    cols.foreach { c =>
      val sk = graft.functions.Kmv.sketch(
        df.filter(col(c).isNotNull).select(col(c))
          .withColumn("__g", lit(1)),
        Seq("__g"), c, k)
      val hs = sk.select(col("h")).collect().map(_.getLong(0)).sorted
      SnapshotIo.writeLongs(hconf(spark), statsDir(path, version, c),
        "h", hs.toIndexedSeq, overwrite = true)
    }
  }

  /** O(delta) STATS MAINTENANCE (round-14): re-ANALYZE after an
    * append without rescanning the lake — KMV sketches merge by
    * bottom-k of the union (any of the k smallest hashes of A ∪ B is
    * among the k smallest of its own side), and the hash is a pure
    * md5 of the value, so merging `fromVersion`'s stored sketch with
    * a sketch over ONLY the appended files is BIT-IDENTICAL to a full
    * [[analyze]] of `toVersion` — at delta cost. The 100 TB posture:
    * stats stay fresh per commit for the price of sketching the
    * arrivals (the [[consumeTail]] argument applied to the catalog).
    * Deltas come from [[addedBetween]], so a compaction-crossed range
    * RAISES (re-run the full [[analyze]] after a rewrite — rewritten
    * files carry the same values, but the file diff no longer means
    * "new rows"). Raises when `fromVersion` has no stats row for a
    * column. Idempotent (overwrite). */
  def analyzeIncremental(spark: SparkSession, path: String,
                         fromVersion: Long, toVersion: Long,
                         cols: Seq[String], k: Int = 64): Unit = {
    require(cols.nonEmpty, "cols required")
    cols.foreach(c => require(c.nonEmpty && c.forall(ch =>
        ch.isLetterOrDigit || ch == '_'),
      s"column name must be [A-Za-z0-9_] for the stats dir, got '$c'"))
    val delta = addedBetween(spark, path, fromVersion, toVersion)
    cols.foreach { c =>
      val stored = SnapshotIo.readLongs(hconf(spark),
        statsDir(path, fromVersion, c), "h")
      require(stored.nonEmpty,
        s"no stats for '$c' at v$fromVersion — run analyze first")
      val sk = graft.functions.Kmv.sketch(
        delta.filter(col(c).isNotNull).select(col(c))
          .withColumn("__g", lit(1)),
        Seq("__g"), c, k)
      val deltaHs = sk.select(col("h")).collect().map(_.getLong(0))
      val merged = (stored ++ deltaHs).distinct.sorted.take(k)
      SnapshotIo.writeLongs(hconf(spark), statsDir(path, toVersion, c),
        "h", merged, overwrite = true)
    }
  }

  /** The stats-catalog readout: one row per analyzed column —
    * (column, sketch_n, theta_h, distinct_est), the
    * [[graft.functions.Kmv.estimate]] columns. Exact regime below
    * capacity (the sketch IS the distinct set), `(k−1)/θ` at
    * capacity. Raises on a column [[analyze]] never ran for. */
  def ndvStats(spark: SparkSession, path: String, version: Long,
               cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "cols required")
    import scala.jdk.CollectionConverters._
    val rows = cols.map { c =>
      val hs = SnapshotIo.readLongs(hconf(spark),
        statsDir(path, version, c), "h")
      require(hs.nonEmpty,
        s"no stats for '$c' at v$version — run analyze first")
      val n = hs.size.toLong
      val thetaH: java.lang.Long =
        if (n == k.toLong) java.lang.Long.valueOf(hs.max) else null
      val est =
        if (n < k) n.toDouble
        else (k - 1).toDouble /
          (hs.max.toDouble / graft.functions.Kmv.hashDomain)
      org.apache.spark.sql.Row(c, java.lang.Long.valueOf(n), thetaH,
        java.lang.Double.valueOf(est))
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("column",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("sketch_n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("theta_h",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("distinct_est",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** The ANALYZE catalog as a PLANNER INPUT (round-14, VERDICT r13
    * #6): the NDV estimate for one analyzed column — `None` when
    * [[analyze]] never ran for it (caller falls back to optimizer
    * estimates), exact below sketch capacity, `(k−1)/θ` at capacity.
    * Driver-side metadata read, ZERO Spark jobs — the point: a
    * broadcast-vs-shuffle decision on a 100 TB lake must come from
    * the stats catalog, not from a live `count()` probe of the data.
    * `k` must match the capacity [[analyze]] ran with (default 64). */
  def ndvOf(spark: SparkSession, path: String, version: Long,
            colName: String, k: Int = 64): Option[Double] = {
    val hs = SnapshotIo.readLongs(hconf(spark),
      statsDir(path, version, colName), "h")
    if (hs.isEmpty) None
    else if (hs.size < k) Some(hs.size.toDouble)
    else Some((k - 1).toDouble /
      (hs.max.toDouble / graft.functions.Kmv.hashDomain))
  }

  private def statsColsDir(path: String) = s"${snapRoot(path)}/statscols"

  /** DECLARE the lake's stats columns (round-15, VERDICT r14 #4): the
    * catalog only helps plans ([[readVersionHinted]], [[ndvOf]]) if it
    * exists and is FRESH, and separate [[analyze]] calls are exactly
    * what a pipeline forgets — a stale catalog then silently mis-gates
    * broadcasts. Once declared (persisted in the snapshot log,
    * metadata-only), EVERY subsequent [[commit]]/[[commitAt]]/
    * [[commitEvolving]] refreshes the declared columns' KMV sketches
    * automatically: O(delta) via [[analyzeIncremental]] when the
    * commit is append-only and the previous version has stats, a full
    * [[analyze]] otherwise (first commit, rewrite-crossed history);
    * [[compact]]-family commits COPY the sketches forward (a
    * content-preserving rewrite cannot change NDV — zero scan).
    * Sketch capacity is the [[analyze]] default (k = 64) — declared
    * stats and ad-hoc ANALYZE share one catalog format. Column names
    * must be directory-safe `[A-Za-z0-9_]` ([[analyze]]'s rule). An
    * empty `cols` clears the declaration. */
  def setStatsColumns(spark: SparkSession, path: String,
                      cols: Seq[String]): Unit = {
    cols.foreach(c => require(c.nonEmpty && c.forall(ch =>
        ch.isLetterOrDigit || ch == '_'),
      s"column name must be [A-Za-z0-9_] for the stats dir, got '$c'"))
    SnapshotIo.writeStrings(hconf(spark), statsColsDir(path), "c",
      cols, overwrite = true)
  }

  /** The declared stats columns ([[setStatsColumns]]) — empty when
    * none are declared. */
  def statsColumns(spark: SparkSession, path: String): Seq[String] =
    SnapshotIo.readStrings(hconf(spark), statsColsDir(path), "c")

  /** The per-commit stats refresh ([[setStatsColumns]] scaladoc):
    * incremental when v's pins are a superset of the previous
    * version's AND the previous version holds stats for every
    * declared column; full otherwise. No-op when nothing is
    * declared — a plain commit stays zero-Spark-jobs. */
  private def autoAnalyze(spark: SparkSession, path: String,
                          v: Long): Unit = {
    val cols = statsColumns(spark, path)
    if (cols.isEmpty) return
    val prev = listVersions(spark, path).filter(_ < v).lastOption
    val incremental = prev.exists { p =>
      readPins(spark, s"${snapRoot(path)}/v=$p").toSet
        .subsetOf(readPins(spark, s"${snapRoot(path)}/v=$v").toSet) &&
        cols.forall(c => SnapshotIo.readLongs(hconf(spark),
          statsDir(path, p, c), "h").nonEmpty)
    }
    if (incremental) analyzeIncremental(spark, path, prev.get, v, cols)
    else analyze(spark, path, v, cols)
  }

  private def manifestColsDir(path: String) =
    s"${snapRoot(path)}/manifestcols"

  /** DECLARE the lake's ZONE-MAP manifest columns (round-15 — the
    * [[setStatsColumns]] pattern applied to the file-skipping
    * catalog): once declared, every [[commit]]/[[commitAt]]/
    * [[commitEvolving]] runs [[graft.sources.Tables.refreshManifest]]
    * — footer stats for NEW files only, vanished files dropped — so
    * the `_graft_manifest` table is always fresh and a
    * [[readVersionPrunedManifest]] probe plans from a metadata read
    * instead of a per-query footer pass over the pinned set. At 10⁵
    * files that is the difference between manifest-planned and
    * footer-planned time travel. An empty `cols` clears the
    * declaration. */
  def setManifestColumns(spark: SparkSession, path: String,
                         cols: Seq[String]): Unit =
    SnapshotIo.writeStrings(hconf(spark), manifestColsDir(path), "c",
      cols, overwrite = true)

  /** The declared manifest columns ([[setManifestColumns]]) — empty
    * when none are declared. */
  def manifestColumns(spark: SparkSession, path: String): Seq[String] =
    SnapshotIo.readStrings(hconf(spark), manifestColsDir(path), "c")

  private def autoManifest(spark: SparkSession, path: String): Unit = {
    val cols = manifestColumns(spark, path)
    if (cols.nonEmpty)
      graft.sources.Tables.refreshManifest(spark, path, cols)
  }

  /** [[readVersionPruned]] planned from the PERSISTED manifest
    * (round-15): manifest rows intersect the version's pins, a pinned
    * file the manifest doesn't know keeps NULL bounds (conservative —
    * purge replacements stay visible), survivors scan with the pinned
    * schema, and the exact predicate re-applies row-level. Zero
    * footer reads on the probe path — the manifest (auto-refreshed
    * per commit under [[setManifestColumns]]) already paid them, once,
    * at commit time. */
  def readVersionPrunedManifest(spark: SparkSession, path: String,
      version: Long, box: Seq[(String, Any, Any)]): DataFrame = {
    val pins = pinnedFiles(spark, path, version)
    graft.sources.Tables.readPrunedManifest(spark, path, box,
      onlyFiles = Some(pins))
  }

  private def constraintsDir(path: String) =
    s"${snapRoot(path)}/constraints"

  /** DECLARE the lake's write-time CHECK constraints (round-15 — the
    * reference's validation posture, dbt tests / Great Expectations
    * suites (reference dags/validation_utils.py:15-127), fused into
    * the lake WRITE path instead of bolted on after): each entry is
    * (name, boolean SQL predicate over the batch's columns). Once
    * declared (persisted in the snapshot log, metadata-only),
    * [[appendChecked]] enforces them on every batch it lands. Names
    * must be `[A-Za-z0-9_]` (they travel in the quarantine's
    * `violated_constraints` CSV column); an empty `cs` clears the
    * declaration. Predicates are stored as text and parsed per use —
    * a malformed predicate fails the WRITE loudly, never silently
    * admits rows. */
  def setConstraints(spark: SparkSession, path: String,
                     cs: Seq[(String, String)]): Unit = {
    cs.foreach { case (n, p) =>
      require(n.nonEmpty && n.forall(ch =>
          (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
            (ch >= '0' && ch <= '9') || ch == '_'),
        s"constraint name must be [A-Za-z0-9_], got '$n'")
      require(p.trim.nonEmpty, s"constraint '$n' has an empty predicate")
    }
    require(cs.map(_._1).distinct.size == cs.size,
      s"duplicate constraint names in ${cs.map(_._1)}")
    SnapshotIo.writeStrings(hconf(spark), constraintsDir(path), "c",
      cs.map { case (n, p) => s"$n\t$p" }, overwrite = true)
  }

  /** The declared constraints ([[setConstraints]]) in declaration
    * order — empty when none are declared. */
  def constraints(spark: SparkSession, path: String): Seq[(String, String)] =
    SnapshotIo.readStrings(hconf(spark), constraintsDir(path), "c")
      .map { s =>
        val i = s.indexOf('\t')
        (s.substring(0, i), s.substring(i + 1))
      }

  /** CONSTRAINT-CHECKED append + commit: split `batch` by the
    * declared predicates — rows where EVERY predicate evaluates TRUE
    * append to the lake and commit ([[commitRetry]], so concurrent
    * checked writers both land); rows where any predicate is FALSE
    * **or NULL** (the conservative gate: an unknown is not an
    * admission — dbt's not_null and GX's strict semantics, not
    * three-valued WHERE) land in the `quarantine` directory with a
    * `violated_constraints` CSV column naming every failed predicate
    * in declaration order. The split is one violation-array
    * projection read through two filtered writes — passes over the
    * DELTA only, never the corpus; both writes are plain appends, so
    * the quarantine is itself a queryable parquet table (triage =
    * groupBy violated_constraints). With nothing declared this is
    * exactly append + commit. Returns (version, nValid,
    * nQuarantined). */
  def appendChecked(spark: SparkSession, path: String,
                    batch: DataFrame,
                    quarantine: String): (Long, Long, Long) = {
    val cs = constraints(spark, path)
    if (cs.isEmpty) {
      val n = batch.count()
      batch.write.mode("append").parquet(path)
      (commitRetry(spark, path), n, 0L)
    } else {
      val viol = array_compact(array(cs.map { case (n, p) =>
        when(!coalesce(expr(p), lit(false)), lit(n))
      }: _*))
      // ONE evaluation of the batch + predicates (localCheckpoint
      // materializes the tagged frame): a time-dependent or
      // non-deterministic predicate, or a batch over a changing
      // source, must not re-evaluate differently between the
      // quarantine write and the live write — that could land a
      // boundary row in both tables or in neither
      val tagged = batch.withColumn("violated_constraints",
        concat_ws(",", viol)).localCheckpoint(true)
      val bad = tagged.filter(col("violated_constraints") =!= "")
      val good = tagged.filter(col("violated_constraints") === "")
        .drop("violated_constraints")
      val nBad = bad.count()
      if (nBad > 0) bad.write.mode("append").parquet(quarantine)
      val nGood = good.count()
      if (nGood > 0) good.write.mode("append").parquet(path)
      (commitRetry(spark, path), nGood, nBad)
    }
  }

  /** Copy a version's sketches forward across a content-preserving
    * rewrite ([[compact]] family): same rows → same md5 hashes → the
    * sketch is bit-identical by construction, at zero scan cost. Only
    * declared columns with stats at `fromV` copy. */
  private def copyStatsForward(spark: SparkSession, path: String,
                               fromV: Long, toV: Long): Unit =
    statsColumns(spark, path).foreach { c =>
      val hs = SnapshotIo.readLongs(hconf(spark),
        statsDir(path, fromV, c), "h")
      if (hs.nonEmpty)
        SnapshotIo.writeLongs(hconf(spark), statsDir(path, toV, c),
          "h", hs, overwrite = true)
    }

  /** Total bytes the version pins — filesystem metadata (file
    * lengths), zero Spark jobs; the size input to a broadcast gate
    * over a whole pinned read. */
  def pinnedBytes(spark: SparkSession, path: String,
                  version: Long): Long = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    pinnedFiles(spark, path, version)
      .map(f => fs.getFileStatus(new Path(f)).getLen).sum
  }

  /** [[readVersion]] with a STATS-DRIVEN broadcast hint: hinted iff
    * the version's pinned bytes ([[pinnedBytes]] — fs metadata, no
    * scan) fit under `maxBytes`. The snapshot-lake twin of
    * [[graft.operators.Broadcasts.maybeBroadcast]]: the optimizer's
    * estimate for an explicit-file-list read is the same file-length
    * sum, but this gate decides from the CATALOG before any plan is
    * built, and composes with [[ndvOf]] for key-side decisions. */
  def readVersionHinted(spark: SparkSession, path: String, version: Long,
      maxBytes: Long = graft.operators.Broadcasts.DefaultMaxBytes)
      : DataFrame = {
    val df = readVersion(spark, path, version)
    if (pinnedBytes(spark, path, version) <= maxBytes) broadcast(df)
    else df
  }

  /** RIGHT-TO-BE-FORGOTTEN purge across ALL retained history — the
    * GDPR/CCPA maintenance op a snapshot lake must have: time travel
    * deliberately preserves every pinned byte, so deleting a subject
    * from the LIVE table is not deletion at all while old versions
    * still replay them. This rewrites every affected retained file
    * WITHOUT the subject's rows and REMAPS every version's manifest
    * to the replacement, preserving the version structure (counts,
    * lineage, as-of semantics for every OTHER row) while the purged
    * rows cease to exist at every point in history.
    *
    * Mechanics: one distributed pass over the distinct retained pins
    * finds affected files (`input_file_name` group — never a
    * driver-side scan); each affected file rewrites MAP-ONLY (its own
    * rows, its own schema — per-file schemas survive evolution, with
    * predicate columns the file lacks null-filled just for the
    * filter) into `purge-<id>/<original parent dirs>/` (path-encoded
    * markers like the WAP batch tag survive — see [[purgeImpl]]);
    * every version manifest rewrites with old→new paths (schema
    * sidecars carried over); originals delete last. A file purged to
    * emptiness drops out of its manifests entirely.
    *
    * Crash contract (re-runnable maintenance): replacements land
    * before any manifest changes, manifests remap one version at a
    * time (each rewrite is [[SnapshotIo]]-atomic), originals delete
    * only after every manifest moved — a crash anywhere leaves every
    * version readable (old pins still on disk) and a re-run
    * re-detects the still-referenced originals and completes. Live
    * branches must resolve first (their staged pins are invisible
    * here and would dangle); tags keep working — their CONTENT
    * changes, which is the entire point of a purge.
    *
    * Scale shape: detection is one metadata-pruned scan; rewrite cost
    * is proportional to AFFECTED files only (cluster the lake on the
    * subject key and zone maps keep that set small — the q530
    * composition); manifest remaps are driver-side metadata. Returns
    * one summary row: (n_versions, n_files_rewritten, n_files_dropped,
    * rows_purged). */
  def purgeWhere(spark: SparkSession, path: String,
                 pred: org.apache.spark.sql.Column): DataFrame = {
    // the predicate's referenced columns — resolved against an empty
    // frame carrying the MERGED schema (driver-only analysis, no data
    // scan; a Spark-4 Column is a ColumnNode tree, so the attribute
    // walk must go through the analyzer) — so the per-file rewrite
    // can null-fill evolved columns a pre-evolution affected file
    // lacks (a DISJUNCTIVE predicate on old-col OR new-col can
    // affect a file that carries only one of them — round-14 ADVICE;
    // the conjunctive case never hits this, but the rewrite must not
    // throw mid-purge on the general shape)
    def predColsIn(schema: org.apache.spark.sql.types.StructType)
        : Seq[String] =
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .select(pred.as("__p")).queryExecution.analyzed.expressions
        .flatMap(_.collect {
          case a: org.apache.spark.sql.catalyst.expressions
            .AttributeReference => a.name
        }).distinct
    purgeImpl(spark, path, "purgeWhere",
      detect = merged => merged
        .select(input_file_name().as("__f"),
          when(pred, 1L).otherwise(0L).as("__m"))
        .groupBy(col("__f"))
        .agg(sum(col("__m")).cast("long").as("n_purge"))
        .filter(col("n_purge") > 0),
      keep = (fileDf, mergedSchema) => {
        val missing = predColsIn(mergedSchema).filter(c =>
          !fileDf.columns.exists(_.equalsIgnoreCase(c)))
        val widened = missing.foldLeft(fileDf) { (df2, c) =>
          df2.withColumn(c, lit(null).cast(mergedSchema.fields
            .find(_.name.equalsIgnoreCase(c)).get.dataType))
        }
        widened.filter(!coalesce(pred, lit(false)))
          .drop(missing: _*)
      })
  }

  /** JOIN-BASED purge across all retained history — [[purgeWhere]]
    * for SET-VALUED subjects (round-14, VERDICT r13 #1): the
    * right-to-be-forgotten list is usually a FRAME (a dedup pass's
    * loser set, a deletion-request table), and funnelling it through
    * a `Column` predicate forces a driver-side collect plus a
    * million-literal `isin` — a driver OOM at 100 TB. Here the
    * subject keys stay distributed end to end: detection is one
    * semi-join of the retained pins against the subject frame
    * (broadcast under the [[graft.operators.Broadcasts]] gate via a
    * count-based size estimate, shuffled otherwise), and each
    * affected file rewrites through an anti-join against the same
    * frame. NULL subject keys are dropped (NULL never equals
    * anything — the `isin`/anti-join shared semantics). Same crash
    * contract, manifest remapping, and report columns as
    * [[purgeWhere]]. */
  def purgeMatching(spark: SparkSession, path: String,
                    subjects: DataFrame, keyCol: String): DataFrame = {
    val subj0 = subjects.select(col(keyCol))
      .filter(col(keyCol).isNotNull).distinct()
      .localCheckpoint(true) // consumed once per affected file
    // broadcast gate from the materialized subject count (a checkpointed
    // LogicalRDD carries no useful optimizer estimate) — a conservative
    // 64 B/key width against the shared 64 MB gate
    val nSubj = subj0.count()
    val subj =
      if (nSubj * 64L <= graft.operators.Broadcasts.DefaultMaxBytes)
        broadcast(subj0)
      else subj0
    purgeImpl(spark, path, "purgeMatching",
      detect = merged => merged
        .select(input_file_name().as("__f"), col(keyCol))
        .join(subj, Seq(keyCol), "left_semi")
        .groupBy(col("__f"))
        .agg(count(lit(1)).cast("long").as("n_purge")),
      keep = (fileDf, _) => fileDf.join(subj, Seq(keyCol), "left_anti"),
      // zone-map prune (round-15, VERDICT r14 #2): detection scans
      // only files whose footer bounds can intersect the subjects'
      // key hull — on a key-clustered lake a small deletion batch
      // reads a handful of files, not the corpus. Conservative
      // (NULL bounds keep; non-prunable key types fall back to the
      // full read); detection re-checks exactly, so hull false
      // positives cost I/O only, never correctness.
      prune = (files, mergedSchema) =>
        graft.sources.Tables.subjectCandidateFiles(spark, files,
          mergedSchema, Seq(keyCol), subj0))
  }

  /** Shared purge engine: `detect` maps the mergeSchema read of every
    * DISTINCT retained pin to (`__f`, n_purge > 0) rows; `keep` maps
    * (one affected file's frame, the merged schema) to its surviving
    * rows. Replacement files land under `purge-<id>/<original parent
    * dirs relative to the lake root>/f-<i>` — the ORIGINAL path
    * segments are preserved so path-encoded markers survive the
    * rewrite, in particular the WAP publish fence (`merge-b<id>-v<N>`
    * — [[graft.streaming.Streaming]]'s `publishedBatch` greps pinned
    * paths for the batch tag; a purge that dropped the segment would
    * let a checkpoint replay re-publish the batch and resurrect the
    * purged rows — round-14 ADVICE). */
  private def purgeImpl(spark: SparkSession, path: String, opName: String,
                        detect: DataFrame => DataFrame,
                        keep: (DataFrame,
                          org.apache.spark.sql.types.StructType) => DataFrame,
                        prune: (Seq[String],
                          org.apache.spark.sql.types.StructType)
                          => Seq[String] = (fs, _) => fs)
      : DataFrame = {
    import org.apache.hadoop.fs.Path
    val vs = listVersions(spark, path)
    require(vs.nonEmpty, s"$opName on unlogged lake $path — commit first")
    require(listBranchNames(spark, path).isEmpty,
      s"$opName at $path: live branches must resolve first — " +
        s"branches: ${listBranchNames(spark, path).mkString(", ")}")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def norm(p: String): String =
      fs.makeQualified(new Path(p)).toString
    val rootUri = fs.makeQualified(new Path(path)).toString
    val pinsByV: Seq[(Long, Seq[String])] =
      vs.map(v => v -> readPins(spark, s"${snapRoot(path)}/v=$v"))
    val files = pinsByV.flatMap(_._2).distinct.sorted
    // affected detection: one distributed pass, grouped by file,
    // zone-map-restricted to `prune`'s candidates (identity for
    // predicate purges — an arbitrary Column predicate has no sound
    // hull). The merged schema still derives from ALL files
    // (footer-only metadata) and pins the candidate read explicitly,
    // so a key/predicate on an EVOLVED column resolves against
    // pre-evolution candidate files too (their rows read NULL there ->
    // no match -> unaffected, which is exactly right: the column did
    // not exist, so no subject rows can hide in them)
    val mergedSchema = spark.read.option("mergeSchema", "true")
      .parquet(files: _*).schema
    val scanFiles = prune(files, mergedSchema)
    val hits =
      if (scanFiles.isEmpty) Map.empty[String, Long]
      else detect(spark.read.schema(mergedSchema)
          .parquet(scanFiles: _*))
        .collect().map(r => (norm(r.getString(0)), r.getLong(1))).toMap
    val affected = files.filter(f => hits.contains(norm(f)))
    val purgeDir = s"$path/purge-" +
      java.util.UUID.randomUUID().toString.take(8)
    // replacement sub-path: the original file's parent dirs relative
    // to the lake root ride along (see scaladoc — the publish fence
    // and any other path-encoded marker survive)
    def relParent(f: String): String = {
      val parent = new Path(norm(f)).getParent.toString
      if (parent == rootUri) ""
      else if (parent.startsWith(rootUri + "/"))
        parent.stripPrefix(rootUri + "/") + "/"
      else new Path(parent).getName + "/" // external-location pin
    }
    // per-affected-file map-only rewrite; None = purged to emptiness
    val mapping: Map[String, Option[String]] =
      affected.zipWithIndex.map { case (f, i) =>
        val sub = s"$purgeDir/${relParent(f)}f-$i"
        keep(spark.read.parquet(f), mergedSchema)
          .coalesce(1)
          .write.parquet(sub)
        val out = listDataFilesIncludingHidden(spark, sub)
        require(out.size <= 1,
          s"$opName: single-file rewrite produced ${out.size} files")
        // an all-purged file may still write one schema-bearing empty
        // part; keep it only if it holds rows (one-row probe)
        val kept = out.headOption
          .filter(o => !spark.read.parquet(o).isEmpty)
        f -> kept
      }.toMap
    // remap every version manifest (atomic per version; sidecar rides)
    pinsByV.foreach { case (v, pins) =>
      val remapped = pins.flatMap(p => mapping.get(p) match {
        case None => Some(p)          // untouched file
        case Some(rep) => rep         // replaced or dropped
      }).sorted
      if (remapped != pins.sorted) {
        val dir = s"${snapRoot(path)}/v=$v"
        val sidecar = SnapshotIo.readSidecar(hconf(spark), dir,
          "_schema.json").map(("_schema.json", _))
        SnapshotIo.writeStrings(hconf(spark), dir, "path", remapped,
          overwrite = true, sidecar = sidecar)
      }
    }
    // originals delete LAST — a crash above leaves every pin readable
    affected.foreach(f => fs.delete(new Path(f), false))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(
        java.lang.Long.valueOf(vs.size.toLong),
        java.lang.Long.valueOf(mapping.count(_._2.isDefined).toLong),
        java.lang.Long.valueOf(mapping.count(_._2.isEmpty).toLong),
        java.lang.Long.valueOf(hits.values.sum))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_versions",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files_rewritten",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files_dropped",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rows_purged",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Data files referenced by NO snapshot — the exact vacuum
    * candidate set (everything else is load-bearing history). On a
    * lake with no snapshots every file is unreferenced (nothing pins
    * anything). File-count-scale set arithmetic on the driver, the
    * documented metadata-collect convention. */
  def unreferencedFiles(spark: SparkSession, path: String): Seq[String] = {
    val vs = listVersions(spark, path)
    val referenced: Set[String] =
      vs.flatMap(v => readPins(spark, s"${snapRoot(path)}/v=$v")).toSet
    listDataFiles(spark, path).filterNot(referenced)
  }

  /** The latest committed version as a frame — the default read of a
    * snapshot-logged lake (a DIRECTORY scan of such a lake is wrong
    * once history accumulates: it would see superseded pre-compaction
    * files alongside their replacements). */
  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val vs = listVersions(spark, path)
    require(vs.nonEmpty, s"no snapshots at $path — commit first")
    readVersion(spark, path, vs.last)
  }

  /** SNAPSHOT-TRANSACTIONAL small-file compaction — the maintenance
    * loop that makes [[graft.operators.Layout.compactExecute]] safe
    * under concurrent readers: the rewrite lands as ONE atomic
    * version instead of mutating files in place.
    *
    *  1. reads exactly the files the LATEST version pins (never a
    *     directory listing — a concurrent append between listing and
    *     rewrite can neither be lost nor double-counted);
    *  2. rewrites them via the next-fit plan
    *     ([[graft.operators.Layout.compactRewrite]], one shuffle
    *     pass, one file per group) into a version-scoped directory
    *     `compact-v<N+1>/` INSIDE the lake;
    *  3. commits version N+1 pinning ONLY the new files.
    *
    * Readers pinned to any version ≤ N keep seeing the original
    * files (they stay on disk as history until [[expire]] +
    * [[vacuum]] reclaim them), a reader landing mid-rewrite sees no
    * change at all (the new directory is unreferenced until the
    * commit), and time travel crosses the rewrite: asOf(N) is
    * bit-stable. A crash before step 3 leaves only an unreferenced
    * directory that the next [[vacuum]] sweeps and a re-run
    * overwrites — the commit IS the transaction. Plain [[commit]]
    * composes afterwards (superseded files never re-pin).
    * Returns the new version. Single compactor at a time (the
    * engine-wide single-maintenance-writer contract); readers need
    * no coordination. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long): Long = {
    import org.apache.hadoop.fs.Path
    val vs = listVersions(spark, path)
    require(vs.nonEmpty,
      s"compact requires a snapshot-logged lake — commit $path first")
    val latest = vs.last
    val files = readPins(spark, s"${snapRoot(path)}/v=$latest").sorted
    require(files.nonEmpty, s"version $latest pins no files — nothing to compact")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sized = files.map(f => (f, fs.getFileStatus(new Path(f)).getLen))
    val v = latest + 1
    graft.operators.Layout.compactRewrite(spark, sized,
      s"$path/compact-v$v", targetBytes)
    writeSnapshot(spark, path, v,
      listDataFiles(spark, s"$path/compact-v$v"), overwrite = false)
    copyStatsForward(spark, path, latest, v)
    autoManifest(spark, path)
    v
  }

  /** [[compact]] with a CLUSTERED rewrite — the Delta `OPTIMIZE
    * ZORDER`/Iceberg `rewrite_data_files(sort)` analog: the latest
    * version's files rewrite range-cut AND sorted on `sortCols`, so
    * the new files carry tight, disjoint footer bounds and every
    * zone-map reader ([[graft.sources.Tables.prunedCandidateFiles]]
    * family) skips all but the value-carrying files afterwards. Same
    * commit-is-the-transaction contract as [[compact]]: readers
    * pinned at ≤ N never notice, asOf crosses the rewrite, a crash
    * before the commit leaves only an unreferenced directory. One
    * range shuffle over the pinned set. Returns the new version. */
  def compactClustered(spark: SparkSession, path: String, nFiles: Int,
                       sortCols: Seq[String]): Long = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    require(sortCols.nonEmpty, "sortCols required")
    val vs = listVersions(spark, path)
    require(vs.nonEmpty,
      s"compactClustered requires a snapshot-logged lake — commit $path first")
    val latest = vs.last
    val files = readPins(spark, s"${snapRoot(path)}/v=$latest").sorted
    require(files.nonEmpty,
      s"version $latest pins no files — nothing to compact")
    val v = latest + 1
    spark.read.parquet(files: _*)
      .repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/compact-v$v")
    writeSnapshot(spark, path, v,
      listDataFiles(spark, s"$path/compact-v$v"), overwrite = false)
    copyStatsForward(spark, path, latest, v)
    autoManifest(spark, path)
    v
  }

  /** [[compact]] with a CALLER-CHOSEN version id — the streaming form
    * ([[graft.streaming.Streaming.snapshotMaintainSink]] derives the
    * maintenance version from the checkpointed batch id): rewrites
    * the files pinned by `version − 1` (a DETERMINISTIC input — not
    * "latest", so a crash-replayed maintenance batch re-reads exactly
    * the same file set) and OVERWRITES `version`. Raises when
    * `version − 1` is absent or a version beyond `version` exists
    * (rewinding past committed history needs [[rollback]] first). */
  def compactAt(spark: SparkSession, path: String, version: Long,
                targetBytes: Long): Unit = {
    import org.apache.hadoop.fs.Path
    require(version >= 2, s"compactAt needs a base version, got $version")
    val vs = listVersions(spark, path)
    require(vs.contains(version - 1),
      s"compactAt($version) requires committed version ${version - 1}" +
        s" — versions: ${vs.mkString(", ")}")
    val others = vs.filter(_ != version)
    require(others.forall(_ < version),
      s"version $version is not the frontier — existing: ${others.sorted}")
    val files =
      readPins(spark, s"${snapRoot(path)}/v=${version - 1}").sorted
    require(files.nonEmpty,
      s"version ${version - 1} pins no files — nothing to compact")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sized = files.map(f => (f, fs.getFileStatus(new Path(f)).getLen))
    graft.operators.Layout.compactRewrite(spark, sized,
      s"$path/compact-v$version", targetBytes)
    writeSnapshot(spark, path, version,
      listDataFiles(spark, s"$path/compact-v$version"), overwrite = true)
    copyStatsForward(spark, path, version - 1, version)
    autoManifest(spark, path)
  }

  /** Truncate the log back to `toVersion`: every snapshot ABOVE it is
    * dropped, ALONG WITH the data files those versions referenced
    * exclusively (files a retained version also pins survive) — the
    * pre-`toVersion` state is restored exactly, which the
    * listing-based [[commit]]/[[commitAt]] depend on: a rolled-back
    * version's leftover data file would otherwise re-enter the next
    * pin as a phantom "fresh append" (and a half-overwritten
    * compaction directory would dangle). Files staged on disk but
    * never committed to ANY version are untouched — a maintenance
    * replay writes its batch directory first, then rolls back. The
    * Iceberg `rollback_to_snapshot` shape with eager exclusive-file
    * cleanup; the streaming maintenance sink uses it to heal a
    * crashed un-checkpointed attempt before replaying. No-op when
    * nothing is above. Returns the dropped versions. */
  def rollback(spark: SparkSession, path: String,
               toVersion: Long): Seq[Long] = {
    require(toVersion >= 0, s"toVersion must be >= 0, got $toVersion")
    val pinnedAbove = listTags(spark, path).filter(_._2 > toVersion)
    require(pinnedAbove.isEmpty,
      s"rollback($toVersion) would orphan tags " +
        pinnedAbove.map { case (n, v) => s"$n=v$v" }.mkString(", ") +
        " — dropTag first (a tag must always resolve)")
    val forkedAbove = listBranchNames(spark, path)
      .map(n => (n, branchFork(spark, path, n)))
      .filter(_._2 > toVersion)
    require(forkedAbove.isEmpty,
      s"rollback($toVersion) would orphan branches " +
        forkedAbove.map { case (n, v) => s"$n@v$v" }.mkString(", ") +
        " — merge or drop them first (a branch must always resolve)")
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = listVersions(spark, path)
    val drop = vs.filter(_ > toVersion)
    if (drop.isEmpty) return drop
    def pinsOf(versions: Seq[Long]): Set[String] =
      versions.flatMap(v => readPins(spark, s"${snapRoot(path)}/v=$v"))
        .toSet
    val exclusive = pinsOf(drop) -- pinsOf(vs.filter(_ <= toVersion))
    exclusive.foreach(f => fs.delete(new Path(f), false))
    drop.foreach(v => fs.delete(new Path(s"${snapRoot(path)}/v=$v"), true))
    drop
  }

  /** Drop all but the last `keepLast` versions from the log —
    * metadata-only (data files remain until [[vacuum]]). TAGGED
    * versions and live BRANCH FORK versions are exempt (see [[tag]] /
    * [[createBranch]]): retention reclaims unnamed history, never a
    * ref's target — so `expire` + [[vacuum]] is always safe to run on
    * a tagged or branched lake. Returns the dropped versions. */
  def expire(spark: SparkSession, path: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tagged = listTags(spark, path).map(_._2).toSet
    val forks = listBranchNames(spark, path)
      .map(n => branchFork(spark, path, n)).toSet
    val drop = listVersions(spark, path).dropRight(keepLast)
      .filterNot(v => tagged(v) || forks(v))
    drop.foreach(v => fs.delete(new Path(s"${snapRoot(path)}/v=$v"), true))
    drop
  }

  /** DELETE the files no retained snapshot references — the exact
    * sweep [[unreferencedFiles]] licenses. Raises on an unlogged lake
    * (there, EVERY file is unreferenced and the sweep would delete
    * the table). Returns the deleted paths. */
  def vacuum(spark: SparkSession, path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // REPAIR FIRST (round-15 ADVICE): a crash between [[SnapshotIo]]'s
    // rename(dest, trash) and rename(tmp, dest) leaves the ONLY copy of
    // a manifest in `.trash-<name>-<token>` with its visible twin
    // missing. Sweeping that trash would lose the manifest permanently
    // — and it must restore BEFORE unreferencedFiles runs, or the
    // missing version's exclusive files would count as unreferenced and
    // be deleted out from under the restored manifest. Mirrors
    // [[Deletes]]' repairPurgeSwaps promote/restore logic.
    val trashPat = "^\\.trash-(.+)-[0-9a-f]{8}$".r
    def repairIn(dir: Path): Unit =
      if (fs.exists(dir))
        fs.listStatus(dir).filter(_.isDirectory).foreach { st =>
          st.getPath.getName match {
            case trashPat(orig) =>
              val visible = new Path(dir, orig)
              if (!fs.exists(visible))
                require(fs.rename(st.getPath, visible),
                  s"vacuum repair: restore failed for ${st.getPath}")
            case _ => repairIn(st.getPath)
          }
        }
    repairIn(new Path(snapRoot(path)))
    require(listVersions(spark, path).nonEmpty,
      s"vacuum on unlogged lake $path would delete every file — commit first")
    val dead = unreferencedFiles(spark, path)
    dead.foreach(f => fs.delete(new Path(f), false))
    // crashed SnapshotIo commits leave hidden `.tmp-*` staging dirs
    // (and completed OVERWRITES may leave `.trash-*` old-manifest
    // siblings whose visible twin exists — the repair above already
    // restored any orphaned trash) under the snapshot root — invisible
    // to every reader (never a readable version), reclaimed here under
    // the engine-wide single-maintenance-writer contract (no concurrent
    // commit can be mid-stage while vacuum runs). Trash dirs are
    // recursed one level so leftovers beside tag/branch manifests
    // sweep too.
    def sweepHidden(dir: Path): Unit =
      if (fs.exists(dir))
        fs.listStatus(dir).filter(_.isDirectory).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(".tmp-") || n.startsWith(".trash-"))
            fs.delete(st.getPath, true)
          else sweepHidden(st.getPath)
        }
    sweepHidden(new Path(snapRoot(path)))
    dead
  }
}
