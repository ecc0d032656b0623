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
    * commit events, not content hashes (matching Delta's behavior). */
  def commit(spark: SparkSession, path: String): Long = {
    val v = listVersions(spark, path).lastOption.getOrElse(0L) + 1L
    val files = listDataFiles(spark, path)
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      files.map(f => org.apache.spark.sql.Row(f)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType, nullable = false))))
    df.coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(s"${snapRoot(path)}/v=$v")
    v
  }

  /** The version log: (version, n_files), ascending — the audit
    * readout. */
  def versions(spark: SparkSession, path: String): DataFrame = {
    val vs = listVersions(spark, path)
    import scala.jdk.CollectionConverters._
    val rows = vs.map { v =>
      val n = spark.read.parquet(s"${snapRoot(path)}/v=$v").count()
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
    val files = spark.read.parquet(s"${snapRoot(path)}/v=$version")
      .select(col("path")).collect().map(_.getString(0)).sorted
    if (files.isEmpty) {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(path).schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Data files referenced by NO snapshot — the exact vacuum
    * candidate set (everything else is load-bearing history). On a
    * lake with no snapshots every file is unreferenced (nothing pins
    * anything). File-count-scale set arithmetic on the driver, the
    * documented metadata-collect convention. */
  def unreferencedFiles(spark: SparkSession, path: String): Seq[String] = {
    val vs = listVersions(spark, path)
    val referenced: Set[String] =
      if (vs.isEmpty) Set.empty
      else spark.read.parquet(vs.map(v => s"${snapRoot(path)}/v=$v"): _*)
        .select(col("path")).collect().map(_.getString(0)).toSet
    listDataFiles(spark, path).filterNot(referenced)
  }
}
