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
}
