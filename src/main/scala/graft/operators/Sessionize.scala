package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of
  * `graft.streaming.Streaming.sessionWindows` (same gap semantics, proven
  * there with mapGroupsWithState): a new session starts wherever the gap
  * to the previous event of the same key exceeds `gapSeconds`.
  *
  * Classic two-window shape: a boundary flag from `lag`, a running sum of
  * boundaries as the session index — both over the same (key, ts) window,
  * so ONE shuffle on the key; the final per-session aggregate groups by
  * (key, session_index). Gap comparison runs in integer microseconds
  * (`unix_micros`), never float epoch — bit-identical on any engine.
  * Ordering is total (ts, then `tieBreakCol`), so session assignment is
  * deterministic under equal timestamps.
  *
  * At 100 TB: per-key window state is one row (the lag); no driver state,
  * no all-pairs. Skewed keys (a bot user with millions of events) sort
  * within one partition — the standard mitigation is pre-splitting such
  * keys by day before sessionizing, which this operator composes with
  * (sessionize per (key, day) slice).
  */
object Sessionize {

  /** Tags every input row with its 1-based `session_index` (the
    * per-event form of [[byGap]] — same boundary semantics, same single
    * key shuffle). Use this when downstream logic needs the events
    * themselves grouped by session (e.g. a per-session funnel), not just
    * the session summaries. */
  def tag(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
          tieBreakCol: String): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(micros, 1).over(w)
    val boundary = when(prev.isNull ||
      micros - prev > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("__brk", boundary)
      .withColumn("session_index", sum(col("__brk")).over(run).cast("long"))
      .drop("__brk")
  }

  /** Returns one row per session: (keyCol, session_index (1-based),
    * session_start, session_end, n_events). */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
            tieBreakCol: String): DataFrame =
    tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
      .groupBy(col(keyCol), col("session_index"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Within-session transition matrix — the user-flow ("Sankey") table:
    * for each ordered pair of event types, how often does `to_type`
    * immediately follow `from_type` inside one session, and what share
    * of `from_type`'s outgoing transitions is that (an exact two-BIGINT
    * division). Session boundaries CUT transitions: the last event of a
    * session has no successor.
    *
    * Shape: the session tag's key shuffle, a second exchange for the
    * (key, session_index) lead window, then one hash aggregate into a
    * |types|² matrix — metadata-scale output, so the per-row share
    * window runs on a tiny frame. */
  def transitions(df: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, gapSeconds: Long,
                  tieBreakCol: String): DataFrame = {
    val tagged = tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
    val w = Window.partitionBy(col(keyCol), col("session_index"))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val matrix = tagged
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    matrix.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"))
  }
}
