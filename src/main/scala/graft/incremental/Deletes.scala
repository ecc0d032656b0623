package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Equality-delete files over a plain parquet lake — Iceberg's
  * merge-on-read row deletion idea at its minimum honest size (cf.
  * the Iceberg v2 spec's "equality delete files"). A delete commit is
  * a tiny parquet table of DISTINCT key tuples under
  * `_graft_deletes/d=N` (a `_`-prefixed directory, invisible to data
  * scans — the [[graft.sources.Tables.writeManifest]] rule), so
  * deleting rows costs ONE key-list append and never touches a data
  * file — the only mutation an object store does cheaply, and the only
  * one that leaves concurrent snapshot readers undisturbed.
  *
  * Read side: [[readWithDeletes]] applies the union of all delete
  * commits as ONE left-anti hash join on the key columns (null-safe
  * `<=>`: a NULL key value is a value, the repo-wide convention) — the
  * tombstone side is key-count-scale and broadcasts below the
  * threshold, so read cost is O(tombstones), never a rewrite. At
  * 100 TB this is the write-cheap/read-taxed half of merge-on-read;
  * [[compact]] is the other half: survivors rewrite once into a fresh
  * lake with ZERO delete files (rewrite-to-new, the
  * [[graft.operators.Layout.compactExecute]] convention — in-place
  * source retirement is the caller's retention decision).
  *
  * Interplay with [[Snapshots]]: snapshot commits pin DATA files only;
  * delete commits are orthogonal visibility (a pinned historical read
  * deliberately does NOT see later tombstones — that is what makes it
  * a snapshot). Callers wanting versioned deletion commit the
  * compacted lake.
  *
  * Reference anchor: the delete+insert incremental strategy
  * (nyc_taxi_pipeline silver loads) deletes by month predicate before
  * re-insert; equality deletes generalize that to arbitrary key sets
  * without coupling deletion to a reload.
  */
object Deletes {

  private def delRoot(path: String) = s"$path/_graft_deletes"

  private def listDeleteIds(spark: SparkSession, path: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(delRoot(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("d=") => n.stripPrefix("d=") }
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted
  }

  /** Number of delete commits currently applied at read time — the
    * read-tax gauge a compaction policy watches. */
  def nDeleteCommits(spark: SparkSession, path: String): Long =
    listDeleteIds(spark, path).size.toLong

  /** Append one equality-delete commit: every row of the lake whose
    * key tuple appears in `keys` (made DISTINCT here) becomes invisible
    * to [[readWithDeletes]]. All commits must carry the SAME key
    * column set — a second commit with different columns raises (a
    * mixed-key tombstone union would silently null-pad and stop
    * matching). Returns the commit id. */
  def writeDeletes(spark: SparkSession, path: String,
                   keys: DataFrame): Long = {
    require(keys.columns.nonEmpty, "delete keys need >= 1 column")
    val ids = listDeleteIds(spark, path)
    ids.headOption.foreach { first =>
      val pinned = spark.read.parquet(s"${delRoot(path)}/d=$first")
        .columns.sorted.toSeq
      require(keys.columns.sorted.toSeq == pinned,
        s"delete key columns ${keys.columns.sorted.mkString(",")} != " +
          s"pinned ${pinned.mkString(",")} — one key set per lake")
    }
    val d = ids.lastOption.getOrElse(0L) + 1L
    keys.distinct().coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(s"${delRoot(path)}/d=$d")
    d
  }

  /** The union of all delete commits, DISTINCT — None when no commit
    * exists (distinguishes "no tombstones" from "empty key list"). */
  def deleteKeys(spark: SparkSession, path: String): Option[DataFrame] = {
    val ids = listDeleteIds(spark, path)
    if (ids.isEmpty) None
    else Some(spark.read
      .parquet(ids.map(d => s"${delRoot(path)}/d=$d"): _*).distinct())
  }

  /** The live view: data files minus tombstoned keys, as ONE
    * null-safe left-anti join (tombstone side auto-broadcast when
    * small via [[graft.operators.Broadcasts.maybeBroadcast]]). */
  def readWithDeletes(spark: SparkSession, path: String): DataFrame = {
    val data = spark.read.parquet(path)
    deleteKeys(spark, path) match {
      case None => data
      case Some(k0) =>
        val k = graft.operators.Broadcasts.maybeBroadcast(k0)
        val cond = k0.columns.map(c => data(c) <=> k(c)).reduce(_ && _)
        data.join(k, cond, "left_anti")
    }
  }

  /** Fold tombstones into data: write the live view to `dst` (a fresh
    * lake, zero delete commits) in `nFiles` files. The source is left
    * untouched — swap/retire is the caller's decision, matching
    * [[graft.operators.Layout.compactExecute]]. */
  def compact(spark: SparkSession, path: String, dst: String,
              nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    readWithDeletes(spark, path)
      .repartition(nFiles)
      .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists).parquet(dst)
  }

  // ---- sequenced tier: merge-on-read UPSERT ------------------------
  // The flat tier above applies every tombstone to every data file —
  // right for pure deletion, wrong for upsert (a batch's tombstones
  // would kill its own inserts). The sequenced tier is Iceberg's
  // sequence-number rule at minimum size: every ADD lands under
  // `add-N`, every delete commit carries its op number, and a delete
  // applies ONLY to rows from adds with a SMALLER op. An upsert is
  // then one op: tombstone the batch's keys at op N + add the batch
  // at op N — old versions die, the new rows (op N, not < N) survive,
  // and NO data file is ever rewritten. Last-writer-wins across
  // upserts falls out of the ordering.

  private def listAddIds(spark: SparkSession, path: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("add-") => n.stripPrefix("add-") }
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted
  }

  /** Seed a sequenced lake: `df` becomes `add-0`. */
  def initBase(spark: SparkSession, path: String, df: DataFrame,
               nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    require(listAddIds(spark, path).isEmpty
      && listDeleteIds(spark, path).isEmpty,
      s"$path already holds a sequenced lake")
    df.repartition(nFiles)
      .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(s"$path/add-0")
  }

  /** [[initBase]] with a CLUSTERED layout — range-cut and sorted on
    * `sortCols`, so the base's parquet footers carry tight min/max
    * bounds and [[readMergedPruned]] can skip base files. Upsert adds
    * are whatever the batch is (small, rarely worth clustering);
    * compaction re-clusters by re-seeding through this. */
  def initBaseClustered(spark: SparkSession, path: String, df: DataFrame,
                        nFiles: Int, sortCols: Seq[String]): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    require(sortCols.nonEmpty, "sortCols required")
    require(listAddIds(spark, path).isEmpty
      && listDeleteIds(spark, path).isEmpty,
      s"$path already holds a sequenced lake")
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(s"$path/add-0")
  }

  /** ZONE-MAP-PRUNED merge-on-read: [[readMerged]] where the data
    * scan opens only the add files whose footer bounds can intersect
    * `box` ([[graft.sources.Tables.prunedCandidateFiles]] — the
    * conservative never-wrong-skip contract), then applies tombstones
    * and re-applies the box row-level. Correctness composes because
    * pruning only drops rows the ROW predicate would drop anyway —
    * tombstones never resurrect a pruned row (they only remove more).
    * The `_graft_deletes` side is never pruned (tombstones must apply
    * whole). The merge-on-read + zone-map capstone: at 100 TB a
    * selective probe over an upsert lake opens the few clustered base
    * files plus the small recent adds, not the lake. */
  def readMergedPruned(spark: SparkSession, path: String,
                       box: Seq[(String, Any, Any)]): DataFrame = {
    val addIds = listAddIds(spark, path)
    require(addIds.nonEmpty, s"no add-N directories under $path")
    val cand = graft.sources.Tables.prunedCandidateFiles(spark, path, box)
    val schema = spark.read
      .option("recursiveFileLookup", "true").parquet(path).schema
    val pred = graft.sources.Tables.boxPredicate(box)
    if (cand.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .filter(pred)
    val data = spark.read.schema(schema)
      .parquet(cand.toIndexedSeq: _*)
      .withColumn("__op",
        regexp_extract(input_file_name(), "add-([0-9]+)/", 1)
          .cast("long"))
    val delIds = listDeleteIds(spark, path)
    val live =
      if (delIds.isEmpty) data.drop("__op")
      else {
        val dels0 = spark.read
          .parquet(delIds.map(i => s"${delRoot(path)}/d=$i"): _*)
          .withColumn("__dop",
            regexp_extract(input_file_name(), "d=([0-9]+)/", 1)
              .cast("long"))
        val keyCols = dels0.columns.filterNot(_ == "__dop").toSeq
        val dels = graft.operators.Broadcasts.maybeBroadcast(dels0)
        val cond = keyCols.map(c => data(c) <=> dels(c)).reduce(_ && _) &&
          dels("__dop") > data("__op")
        data.join(dels, cond, "left_anti").drop("__op")
      }
    live.filter(pred)
  }

  /** Merge-on-read upsert: one op = tombstone the batch's keys +
    * append the batch. The batch must be UNIQUE on `keyCols` (two
    * versions of a key in one op have no order — raises). Returns the
    * op id. Cost: one key-list write + one batch append — zero data
    * files rewritten, the O(batch) upsert a 100 TB lake needs.
    * Mid-commit visibility matches [[upsertAt]]: add directory first,
    * delete file second — a concurrent reader between the two writes
    * sees transient duplicate-version rows, never missing keys. A
    * crash between them surfaces LOUDLY on the next `upsert` call
    * (the half-commit detector below), never as silent loss or
    * silent permanent duplicates; repair = replay the batch through
    * [[upsertAt]] at the flagged op. */
  def upsert(spark: SparkSession, path: String, batch: DataFrame,
             keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "keyCols required")
    val dup = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
    require(dup == 0,
      s"upsert batch has $dup duplicate key tuples — one version per op")
    val adds = listAddIds(spark, path)
    val dels = listDeleteIds(spark, path)
    val frontierAdd = adds.foldLeft(0L)(math.max)
    require(frontierAdd == 0L || dels.contains(frontierAdd),
      s"half-committed op $frontierAdd (add directory without its delete " +
        s"file) — replay that batch via upsertAt(op=$frontierAdd) to " +
        "repair before appending new ops")
    val op = (adds ++ dels).foldLeft(0L)(math.max) + 1L
    batch.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(s"$path/add-$op")
    writeDeletesAt(spark, path, batch.select(keyCols.map(col): _*), op)
    op
  }

  private def writeDeletesAt(spark: SparkSession, path: String,
                             keys: DataFrame, op: Long): Unit =
    keys.distinct().coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(s"${delRoot(path)}/d=$op")

  /** [[upsert]] with a CALLER-CHOSEN op id and overwrite semantics —
    * the streaming form ([[graft.streaming.Streaming.upsertSink]]
    * derives op = batchId + 1 from the checkpointed batch id, so a
    * crash-REPLAYED batch overwrites its own delete file and add
    * directory instead of appending a fresh op — idempotence by
    * path, the monthOverwrite rule). Raises when `op` would break
    * monotonicity against ops OTHER than itself (an out-of-order op
    * could resurrect rows a later delete killed).
    *
    * Mid-commit visibility: the two writes are NOT atomic (plain
    * parquet directories have no commit protocol). The ADD directory
    * is written FIRST, the delete file second, so a concurrent
    * `readMerged` landing between them — or after a crash, until the
    * checkpointed batch replays — sees the upserted keys with BOTH
    * versions live (transient duplicate-version rows), never with
    * their rows missing. Duplicates-over-losses is the deliberate
    * choice: a reader that retries converges, while transiently
    * vanished keys silently corrupt any downstream join. Replay of
    * the same op overwrites both paths and restores exactly-once. */
  def upsertAt(spark: SparkSession, path: String, batch: DataFrame,
               keyCols: Seq[String], op: Long): Unit = {
    require(keyCols.nonEmpty, "keyCols required")
    val others = (listAddIds(spark, path) ++ listDeleteIds(spark, path))
      .filter(_ != op)
    require(others.forall(_ < op),
      s"op $op is not the frontier — existing ops ${others.sorted}")
    val dup = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
    require(dup == 0, "upsert batch has duplicate key tuples")
    batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/add-$op")
    batch.select(keyCols.map(col): _*).distinct().coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"${delRoot(path)}/d=$op")
  }

  /** Read a sequenced lake: every row is tagged with its add's op
    * (from the file path — no schema pollution), tombstones with
    * theirs, and the anti-join keeps a row unless some delete with a
    * LARGER op names its key (null-safe). One scan + one anti-join;
    * the tombstone side stays key-count-scale. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    readMergedAsOf(spark, path, Long.MaxValue)

  /** TIME TRAVEL on the sequenced lake: the merged view as it stood
    * after op `asOf` — only adds ≤ asOf scan, only deletes ≤ asOf
    * apply. Free by construction (ops are already the total order);
    * the reproducible-training-run read for an upsert lake, the
    * [[Snapshots.readVersion]] analog without a snapshot log.
    * Raises when no add ≤ asOf exists (asking for history before the
    * base is a caller bug). */
  def readMergedAsOf(spark: SparkSession, path: String,
                     asOf: Long): DataFrame = {
    val addIds = listAddIds(spark, path).filter(_ <= asOf)
    require(addIds.nonEmpty,
      s"no add-N directories at or before op $asOf under $path")
    val data = spark.read
      .parquet(addIds.map(i => s"$path/add-$i"): _*)
      .withColumn("__op",
        regexp_extract(input_file_name(), "add-([0-9]+)/", 1)
          .cast("long"))
    val delIds = listDeleteIds(spark, path).filter(_ <= asOf)
    if (delIds.isEmpty) data.drop("__op")
    else {
      val dels0 = spark.read
        .parquet(delIds.map(d => s"${delRoot(path)}/d=$d"): _*)
        .withColumn("__dop",
          regexp_extract(input_file_name(), "d=([0-9]+)/", 1)
            .cast("long"))
      val keyCols = dels0.columns.filterNot(_ == "__dop").toSeq
      val dels = graft.operators.Broadcasts.maybeBroadcast(dels0)
      val cond = keyCols.map(c => data(c) <=> dels(c)).reduce(_ && _) &&
        dels("__dop") > data("__op")
      data.join(dels, cond, "left_anti").drop("__op")
    }
  }

  /** The sequenced lake's op log: one row per op id —
    * (op, n_add_files, n_tombstone_files), ascending. Op 0 is the
    * base; a pure-delete op has zero add files; file counts come from
    * directory listings (metadata-scale, zero Spark jobs beyond the
    * frame build). The audit readout behind the SQL surface's
    * `<name>_ops` view ([[graft.sql.SqlCatalog.registerMorLake]]). */
  def ops(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles(dir: String): Long = {
      val p = new Path(dir)
      if (!fs.exists(p)) 0L
      else {
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) {
          val f = it.next()
          val nm = f.getPath.getName
          if (f.isFile && nm.endsWith(".parquet") &&
              !nm.startsWith("_") && !nm.startsWith(".")) n += 1
        }
        n
      }
    }
    val adds = listAddIds(spark, path).toSet
    val dels = listDeleteIds(spark, path).toSet
    import scala.jdk.CollectionConverters._
    val rows = (adds ++ dels).toSeq.sorted.map { op =>
      org.apache.spark.sql.Row(op,
        java.lang.Long.valueOf(
          if (adds(op)) nFiles(s"$path/add-$op") else 0L),
        java.lang.Long.valueOf(
          if (dels(op)) nFiles(s"${delRoot(path)}/d=$op") else 0L))
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_add_files",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tombstone_files",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** MERGE-style mixed batch on the sequenced lake — Delta's
    * `WHEN MATCHED [AND cond] THEN DELETE / UPDATE, WHEN NOT MATCHED
    * INSERT` reduced to its storage effect: `batch` carries an `opCol`
    * of 'upsert' (insert-or-replace the key) or 'delete' (tombstone
    * the key), and ONE op applies both — every batch key is
    * tombstoned at op N, and only the upsert rows are appended at op
    * N. Same cost shape as [[upsert]]: one key-list write + one
    * (smaller) append, zero rewrites. The batch must be unique on
    * `keyCols` and `opCol` values must be exactly 'upsert'/'delete'
    * (raise otherwise). Returns the op id. */
  def applyMergeBatch(spark: SparkSession, path: String,
                      batch: DataFrame, keyCols: Seq[String],
                      opCol: String): Long = {
    require(keyCols.nonEmpty, "keyCols required")
    val bad = batch.filter(col(opCol).isNull
      || !col(opCol).isin("upsert", "delete")).count()
    require(bad == 0, s"$bad rows carry an op other than" +
      " 'upsert'/'delete'")
    val dup = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
    require(dup == 0,
      s"merge batch has $dup duplicate key tuples — one verdict per key")
    val op = (listAddIds(spark, path) ++ listDeleteIds(spark, path))
      .foldLeft(0L)(math.max) + 1L
    writeDeletesAt(spark, path, batch.select(keyCols.map(col): _*), op)
    val inserts = batch.filter(col(opCol) === "upsert").drop(opCol)
    if (inserts.limit(1).count() > 0)
      inserts.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$path/add-$op")
    op
  }

  /** CHANGE DATA FEED between two ops of a sequenced lake — "what
    * changed between version i and version j?" as delete/insert
    * retraction events, Delta's CDF on the upsert lake: pure
    * composition of [[readMergedAsOf]] with
    * [[graft.operators.Diff.toCdcFeed]], so
    * `applyCdcFeed(asOf(i), cdcBetween(i, j)) ≡ asOf(j)` holds by the
    * Diff round-trip identity (q236). `keyCols` are the lake's upsert
    * keys. */
  def cdcBetween(spark: SparkSession, path: String, fromOp: Long,
                 toOp: Long, keyCols: Seq[String]): DataFrame = {
    require(fromOp <= toOp, s"fromOp $fromOp > toOp $toOp")
    graft.operators.Diff.toCdcFeed(
      readMergedAsOf(spark, path, fromOp),
      readMergedAsOf(spark, path, toOp), keyCols)
  }

  /** Fold a sequenced lake's whole op history into a fresh base:
    * `dst` gets the merged view as its `add-0` and ZERO delete
    * commits, resetting the op counter — the periodic maintenance
    * that keeps [[readMerged]]'s tombstone join small. Source
    * untouched (rewrite-to-new, as [[compact]]). */
  def compactSequenced(spark: SparkSession, path: String, dst: String,
                       nFiles: Int): Unit =
    initBase(spark, dst, readMerged(spark, path), nFiles)

  // ----------------------------------------------------------------
  // Right to be forgotten on the sequenced lake (round-14)
  // ----------------------------------------------------------------

  /** RIGHT-TO-BE-FORGOTTEN purge on a SEQUENCED merge-on-read lake —
    * the [[Snapshots.purgeMatching]] twin for the other lake
    * substrate: tombstoning a subject only HIDES it from the merged
    * view; the bytes survive in every `add-N` file, time travel
    * ([[readMergedAsOf]]) replays them, and the tombstone files
    * themselves carry the subject's KEY (which is usually the
    * personal identifier). This erases all three: every affected
    * `add-N` op directory rewrites WITHOUT the subject's rows
    * (op assignment — the path — is preserved, so ordering,
    * last-writer-wins, time travel, and CDC stay intact for every
    * other row), and every affected tombstone commit rewrites without
    * the subject's keys (safe once no add row carries them — a
    * subject tombstone then kills nothing).
    *
    * The subject set is a FRAME end to end (semi-join detection,
    * anti-join rewrites; broadcast under the
    * [[graft.operators.Broadcasts]] gate via a count-based estimate).
    * NULL subject keys are dropped (NULL never matches — the
    * engine-wide isin/anti-join semantics). Rewrite unit is the OP
    * DIRECTORY (batch-sized by construction; the base `add-0` is the
    * worst case and only pays when subjects hit it).
    *
    * Crash contract (single-maintenance-writer, re-runnable): each
    * affected dir swaps via stage (`.purge-<dir>-<token>`, hidden) →
    * rename dir aside (`.trash-<dir>-<token>`) → rename stage in →
    * drop trash; [[purgeMatching]] repairs any interrupted swap
    * before starting (promote a staged dir whose visible twin
    * vanished, drop orphans), so a crash anywhere loses nothing and a
    * re-run completes. Returns one row: (n_add_dirs_rewritten,
    * n_tombstone_dirs_rewritten, rows_purged, tombstone_keys_purged). */
  def purgeMatching(spark: SparkSession, path: String,
                    subjects: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(keyCols.nonEmpty, "keyCols required")
    repairPurgeSwaps(spark, path)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subj0 = subjects.select(keyCols.map(col): _*)
      .na.drop("any", keyCols).distinct().localCheckpoint(true)
    val nSubj = subj0.count()
    val subj =
      if (nSubj * 64L * keyCols.size <=
          graft.operators.Broadcasts.DefaultMaxBytes) broadcast(subj0)
      else subj0
    val token = java.util.UUID.randomUUID().toString.take(8)
    // affected DIRS: one distributed semi-join pass per side over the
    // zone-map candidate files only (round-15, VERDICT r14 #2 — the
    // footer-bounds hull prune; conservative, so a skipped file
    // provably holds no subject row), grouped by file, folded to
    // parent dirs on the driver (file-count scale)
    def dataFilesUnder(dirs: Seq[String]): Seq[String] =
      dirs.flatMap { d =>
        val p = new Path(d)
        val it = fs.listFiles(p, true)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          val n = f.getPath.getName
          if (f.isFile && n.endsWith(".parquet") &&
              !n.startsWith("_") && !n.startsWith("."))
            out += f.getPath.toString
        }
        out
      }.sorted
    def affected(dirs: Seq[String], cols: Seq[String]): Map[String, Long] = {
      if (dirs.isEmpty) return Map.empty
      val files = dataFilesUnder(dirs)
      if (files.isEmpty) return Map.empty
      val schema = spark.read.option("mergeSchema", "true")
        .parquet(files: _*).schema
      val cand = graft.sources.Tables.subjectCandidateFiles(spark,
        files, schema, cols, subj0)
      if (cand.isEmpty) return Map.empty
      spark.read.schema(schema).parquet(cand: _*)
        .select(input_file_name().as("__f") +: cols.map(col): _*)
        .join(subj, cols, "left_semi")
        .groupBy(col("__f")).agg(count(lit(1)).cast("long").as("__n"))
        .collect()
        .map(r => (new Path(r.getString(0)).getParent.toString,
          r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    // swap one op directory for its subject-free rewrite
    def swap(dir: String): Unit = {
      val p = new Path(dir); val parent = p.getParent
      val name = p.getName
      val staged = new Path(parent, s".purge-$name-$token")
      spark.read.parquet(dir).join(subj, keyCols, "left_anti")
        .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(staged.toString)
      val trash = new Path(parent, s".trash-$name-$token")
      require(fs.rename(p, trash) && fs.rename(staged, p),
        s"purgeMatching: directory swap failed for $dir")
      fs.delete(trash, true)
    }
    val addDirs = listAddIds(spark, path).map(i => s"$path/add-$i")
    val addHits = affected(addDirs, keyCols)
    addHits.keys.toSeq.sorted.foreach(swap)
    val delDirs = listDeleteIds(spark, path)
      .map(d => s"${delRoot(path)}/d=$d")
    // tombstone key columns must cover the subject keys to match
    val delHits =
      if (delDirs.isEmpty) Map.empty[String, Long]
      else {
        val delCols = spark.read.parquet(delDirs.head).columns.toSeq
        if (keyCols.forall(k => delCols.exists(_.equalsIgnoreCase(k))))
          affected(delDirs, keyCols)
        else Map.empty[String, Long]
      }
    delHits.keys.toSeq.sorted.foreach(swap)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(
        java.lang.Long.valueOf(addHits.size.toLong),
        java.lang.Long.valueOf(delHits.size.toLong),
        java.lang.Long.valueOf(addHits.values.sum),
        java.lang.Long.valueOf(delHits.values.sum))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_add_dirs_rewritten",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "n_tombstone_dirs_rewritten",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rows_purged",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("tombstone_keys_purged",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Complete or roll back any purge swap a crash interrupted (see
    * [[purgeMatching]]'s crash contract): a staged dir whose visible
    * twin vanished promotes (the swap was mid-flight); a staged dir
    * whose visible twin still exists is a pre-swap orphan and drops
    * (the re-run redoes the rewrite); a trash dir whose visible twin
    * exists drops (the swap completed). Idempotent; called by
    * [[purgeMatching]] before every run. */
  private def repairPurgeSwaps(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    def repairIn(parent: Path): Unit = {
      if (!fs.exists(parent)) return
      val entries = fs.listStatus(parent).filter(_.isDirectory)
      val pat = "^\\.(purge|trash)-(.+)-[0-9a-f]{8}$".r
      entries.foreach { st =>
        st.getPath.getName match {
          case pat(kind, orig) =>
            val visible = new Path(parent, orig)
            kind match {
              case "purge" =>
                if (!fs.exists(visible)) {
                  require(fs.rename(st.getPath, visible),
                    s"purge repair: promote failed for ${st.getPath}")
                } else fs.delete(st.getPath, true)
              case "trash" =>
                if (fs.exists(visible)) fs.delete(st.getPath, true)
                else require(fs.rename(st.getPath, visible),
                  s"purge repair: restore failed for ${st.getPath}")
            }
          case _ => ()
        }
      }
    }
    repairIn(new Path(path))
    repairIn(new Path(delRoot(path)))
  }
}
