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

  /** Market-basket association mining over gap-sessions: which event
    * types CO-OCCUR in a session, with the classic support / confidence
    * / lift measures. The unordered complement of
    * [[graft.operators.Sessionize.transitions]] (which counts ordered
    * adjacent steps): a basket here is the DISTINCT type set of one
    * (key, session).
    *
    * Per unordered type pair a < b:
    *   support    = n_ab / n_baskets
    *   conf_a_b   = n_ab / n_a,  conf_b_a = n_ab / n_b
    *   lift       = (n_ab · n_baskets) / (n_a · n_b)
    * All numerators/denominators are exact BIGINTs (lift multiplies
    * BEFORE its one division), so every measure is engine-exact.
    *
    * Scale shape: one session tag (key shuffle + window), one distinct
    * over (key, session, type) riding the same partitioning, then a
    * collect_set per basket — state bounded by |event types| — and a
    * map-stage C(k,2) pair fan-out into a pair-scale aggregate (the
    * q163 set-fan-out shape, never a basket self-join). Totals ride as
    * one broadcast row. */
  def basketPairs(df: DataFrame, keyCol: String, tsCol: String,
                  tieBreakCol: String, typeCol: String,
                  gapSeconds: Long): DataFrame = {
    val tagged = Sessionize.tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
    val baskets = tagged
      .groupBy(col(keyCol), col("session_index"))
      .agg(sort_array(collect_set(col(typeCol))).as("types"))
    val totals = baskets.agg(count(lit(1)).as("n_baskets"))
    val sizes = baskets.select(explode(col("types")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val pairs = baskets.filter(size(col("types")) >= 2)
      .select(posexplode(col("types")).as(Seq("__i", "type_a")), col("types"))
      .select(col("type_a"),
        explode(slice(col("types"), col("__i") + lit(2),
          size(col("types")) - col("__i") - lit(1))).as("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(sizes.select(col("t").as("type_a"), col("n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(sizes.select(col("t").as("type_b"), col("n").as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_baskets"),
        (col("n_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_a"),
        ((col("n_ab") * col("n_baskets")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
