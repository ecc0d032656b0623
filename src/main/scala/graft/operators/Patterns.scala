package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered event-sequence pattern matching — the MATCH_RECOGNIZE-lite a
  * product funnel or abuse detector needs: render each key's event-type
  * journey as one ordered token string and test a regex over it
  * ("signup then eventually purchase", "three errors in a row", ...).
  *
  * Determinism: the journey is built from `sort_array` over
  * (ts, tieBreak, token) structs — a total lexicographic order, so the
  * same string materializes at any parallelism; the oracle mirrors it
  * with `list(x ORDER BY ts, tieBreak)`. Keep patterns inside the
  * RE2-compatible subset (literals, classes, `.*`, alternation) — both
  * engines agree there; Java-only constructs (backrefs, lookahead) are
  * not portable.
  *
  * Scale shape: one hash aggregate (collect per key) — the journey lives
  * only inside its row, never in driver memory. Keys with pathological
  * event counts make pathological strings; cap upstream (e.g.
  * [[Sessionize.byGap]] then match per session) when journeys are
  * unbounded.
  */
object Patterns {

  /** One row per key: (keyCol, journey, matched). */
  def matchSequence(df: DataFrame, keyCol: String, tsCol: String,
                    tieBreakCol: String, tokenCol: String,
                    pattern: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieBreakCol), col(tokenCol)))).as("__evs"))
      .select(col(keyCol),
        array_join(expr(s"transform(__evs, e -> e.$tokenCol)"), " ").as("journey"))
      .withColumn("matched", col("journey").rlike(pattern))
}
