package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the co-located-join discipline for the
  * joins a pipeline repeats every run (fact-to-fact on the same key:
  * snapshot diffs, incremental merges, enrichment against a large
  * dimension). Writing BOTH sides bucketed (and in-bucket sorted) on
  * the join key means every future sort-merge join starts from
  * pre-shuffled, pre-sorted inputs: Spark's bucketing-aware scan
  * reports the hash partitioning, and the join plans with ZERO
  * Exchange on either side — at 100 TB that is the difference between
  * a full-cluster shuffle per run and none (`BucketingSpec`-style
  * proof lives in Round7OpsSpec: the joined plan contains no
  * ShuffleExchange).
  *
  * Contract notes:
  *  - both sides must use the SAME bucket count and key for the
  *    exchange-free join (mismatched counts fall back to shuffling
  *    the smaller-bucketed side — still correct, half the win);
  *  - buckets are hash(key) mod n — the same salting-agnostic
  *    partitioning `repartition(col)` produces, so bucketed layout
  *    composes with every operator here;
  *  - `saveAsTable` is the managed-table API bucketing requires
  *    (plain `.parquet(path)` cannot record bucket metadata). */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed parquet table
    * (overwrite). `nBuckets` scales with data: target ≤ a few hundred
    * MB per bucket at the expected table size. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.write
      .format("parquet")
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog,
    * so the scan reports hash partitioning to the planner). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** [[writeBucketed]] as an EXTERNAL table at an explicit `path` —
    * the form a lake deployment uses (data lives in the lake, only
    * bucket metadata rides the catalog), and the form tests use to
    * keep managed-warehouse state out of the working directory. */
  def writeBucketedAt(df: DataFrame, table: String, keyCol: String,
                      nBuckets: Int, path: String): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
