package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-row-per-key deduplication — the Spark form of Postgres
  * `SELECT DISTINCT ON (key) * ... ORDER BY key, tiebreak`
  * (reference: silver_yellow_tripdata.sql:85-87; SURVEY.md §2.5 W1).
  */
object Dedup {

  /** Keep exactly one row per `keys`, the first under `ordering`.
    *
    * Implementation: `row_number` over a window partitioned by the key.
    * At scale this is one hash shuffle on the key (same cost class as the
    * groupBy alternative) and streams each group — no group is
    * materialized, so skewed keys spill but don't OOM.
    *
    * Determinism (SURVEY.md §7.4 item 2): `DISTINCT ON` picks an arbitrary
    * survivor among rows tying on `ordering`. For reproducible output pass
    * a TOTAL ordering (extend with all remaining columns) — callers that
    * need oracle-exactness use [[firstRowPerKeyTotal]]. */
  def firstRowPerKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[firstRowPerKey]] with the ordering extended by every remaining
    * column, giving a total order and hence a deterministic survivor. */
  def firstRowPerKeyTotal(df: DataFrame, keys: Seq[String], ordering: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(c => keys.contains(c) || ordering.contains(c))
    firstRowPerKey(df, keys.map(col), (ordering ++ rest).map(col))
  }

  /** Burst (debounce) dedup: within each key, keep only the FIRST
    * event of every burst — a new burst starts where the gap to the
    * PREVIOUS event exceeds `windowSeconds` (gap semantics, exactly
    * the sessionization rule, so "burst" ≡ "session" and the survivor
    * is its opening event). The double-click / retry-storm / duplicate
    * webhook cleaner: identical payloads milliseconds apart collapse,
    * genuine re-occurrences later survive.
    *
    * Deterministic: in-key order is (ts, tieBreak) — total; gap
    * comparison is exact integer microseconds. One key-partitioned
    * window (single hash shuffle, groups streamed). */
  def burstFirst(df: DataFrame, keys: Seq[String], tsCol: String,
                 tieBreakCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0, got $windowSeconds")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    df.withColumn("__prev_us", lag(us, 1).over(w))
      .filter(col("__prev_us").isNull ||
        us - col("__prev_us") > windowSeconds * 1000000L)
      .drop("__prev_us")
  }
}
