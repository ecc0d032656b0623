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

  /** Sequential pattern support (PrefixSpan-lite, length 2): for each
    * ORDERED type pair (a, b), in how many sessions does some a-event
    * happen strictly before some b-event? The ordered, NON-contiguous
    * complement of both [[basketPairs]] (unordered co-occurrence) and
    * `Sessionize.transitions` (adjacent steps only): "signup … then
    * eventually purchase, anything in between".
    *
    * "some a before some b" ⟺ FIRST occurrence of a precedes LAST
    * occurrence of b — so each session reduces to one (type, first,
    * last) row per distinct type (state bounded by |types|), and pairs
    * fan out from that per-session set (the q163 set-fan-out shape,
    * never a session self-join). Occurrence order is the total
    * (ts, tieBreak) order; support = n_ab / n_sessions is exact
    * integers with one final division. */
  def sequencePairSupport(df: DataFrame, keyCol: String, tsCol: String,
                          tieBreakCol: String, typeCol: String,
                          gapSeconds: Long): DataFrame = {
    val tagged = Sessionize.tag(df, keyCol, tsCol, gapSeconds, tieBreakCol)
    val spans = tagged
      .groupBy(col(keyCol), col("session_index"), col(typeCol).as("t"))
      .agg(min(struct(col(tsCol), col(tieBreakCol))).as("first_ev"),
        max(struct(col(tsCol), col(tieBreakCol))).as("last_ev"))
      .groupBy(col(keyCol), col("session_index"))
      .agg(collect_list(struct(col("t"), col("first_ev"), col("last_ev")))
        .as("__spans"))
    val totals = spans.agg(count(lit(1)).as("n_sessions"))
    val pairs = spans
      .select(explode(col("__spans")).as("a"), col("__spans"))
      .select(col("a"), explode(col("__spans")).as("b"))
      .filter(col("a.t") =!= col("b.t") && col("a.first_ev") < col("b.last_ev"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs.crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_sessions"),
        (col("n_ab").cast("double") / col("n_sessions").cast("double"))
          .as("support"))
  }

  /** Process-conformance report: which session-bounded transitions occur,
    * and which of them violate a declared allowed-transition whitelist —
    * the process-mining half of [[graft.operators.Sessionize.transitions]]
    * (which only measures; this one JUDGES against the intended state
    * machine). The operational check for event-instrumentation bugs
    * ("purchase fired before click"), bot traffic (impossible paths), or
    * pipeline reordering.
    *
    * Output: one row per observed (from_type, to_type) with its count and
    * `is_allowed`; violations are the `!is_allowed` rows. The whitelist
    * is a literal broadcast table; the transition scan is the one session
    * window [[graft.operators.Sessionize.transitions]] already costs. */
  def conformanceReport(df: DataFrame, keyCol: String, tsCol: String,
                        typeCol: String, gapSeconds: Long, tieBreakCol: String,
                        allowed: Seq[(String, String)]): DataFrame = {
    require(allowed.nonEmpty, "allowed transition list must be non-empty")
    val spark = df.sparkSession
    val allowedDf = broadcast(
      spark.createDataFrame(allowed).toDF("from_type", "to_type")
        .withColumn("__ok", lit(true)))
    Sessionize.transitions(df, keyCol, tsCol, typeCol, gapSeconds, tieBreakCol)
      .select("from_type", "to_type", "n")
      .join(allowedDf, Seq("from_type", "to_type"), "left")
      .withColumn("is_allowed", coalesce(col("__ok"), lit(false)))
      .drop("__ok")
  }

  /** Next-event-prediction evaluation: train a first-order Markov model
    * (the `Sessionize.transitions` matrix) on one slice, score top-1
    * accuracy on another — the in-engine eval loop for "is user
    * behavior predictable enough to pre-fetch / rank by". Prediction
    * per from_type is argmax count (ties → lexicographically smallest
    * to_type, a total rule); accuracy is exact integers with one final
    * division. Unseen from_types predict NULL and score as misses.
    *
    * Scale shape: the model matrix is |types|² — broadcast; eval is one
    * session window over the eval slice + a broadcast join. */
  def markovEval(train: DataFrame, eval: DataFrame, keyCol: String,
                 tsCol: String, typeCol: String, gapSeconds: Long,
                 tieBreakCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBest = Window.partitionBy(col("from_type"))
      .orderBy(col("n").desc, col("to_type").asc)
    val predicted = Sessionize
      .transitions(train, keyCol, tsCol, typeCol, gapSeconds, tieBreakCol)
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted_to"))
    val tagged = Sessionize.tag(eval, keyCol, tsCol, gapSeconds, tieBreakCol)
    val wSess = Window.partitionBy(col(keyCol), col("session_index"))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    tagged
      .withColumn("__to", lead(col(typeCol), 1).over(wSess))
      .filter(col("__to").isNotNull)
      .select(col(typeCol).as("from_type"), col("__to").as("actual_to"))
      .join(broadcast(predicted), Seq("from_type"), "left")
      .groupBy(col("from_type"))
      .agg(max(col("predicted_to")).as("predicted_to"), // constant per group
        count(lit(1)).as("n_transitions"),
        sum(coalesce((col("actual_to") === col("predicted_to")).cast("long"),
          lit(0L))).as("n_hits"))
      .withColumn("accuracy",
        col("n_hits").cast("double") / col("n_transitions").cast("double"))
  }

  /** Frequent 3-itemsets: ordered item triples (a < b < c) co-occurring
    * in at least `minSupport` baskets — one rung up the association
    * ladder from [[basketPairs]] (pairs miss three-way bundles whose
    * pairwise supports are unremarkable).
    *
    * The triple fan-out is MAP-SIDE off each basket's sorted distinct
    * item array (chained generators with position guards — C(k,3) rows
    * per basket, no self-join anywhere); one hash aggregate counts
    * supports. Cost is Σ C(k,3) over baskets: cap pathological basket
    * sizes upstream the way every association miner does (a 10k-item
    * basket is a crawler, not a customer). Item ordering inside a
    * triple is the array's sort order — ascending, engine-identical. */
  /** Association rules {a, b} → c from frequent 3-itemsets: for every
    * triple passing `minSupport` and every choice of consequent,
    * confidence = sup{a,b,c} / sup{antecedent pair} and lift =
    * confidence / P(consequent) — the actionable form of [[itemsets3]]
    * ("customers with a AND b also buy c"), one rung past
    * [[basketPairs]]' single-antecedent rules.
    *
    * Counts are exact BIGINTs from two aggregates (pairs via the same
    * map-side C(k,2) generator, triples via [[itemsets3]]); each
    * metric is a single division / one fixed two-division tree. Pair
    * supports join back on the antecedent pair (pair-table-scale);
    * basket count rides a one-row broadcast. */
  def rules3(df: DataFrame, basketCol: String, itemCol: String,
             minSupport: Long): DataFrame = {
    val triples = itemsets3(df, basketCol, itemCol, minSupport)
    val b = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull).distinct()
    val pairs = b.as("x").join(b.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("pa"), col("y.__i").as("pb"))
      .agg(count(lit(1)).as("pair_support"))
    val itemCounts = b.groupBy(col("__i").as("ci"))
      .agg(count(lit(1)).as("__cn"))
    val nBaskets = b.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__nb"))
    // three rules per triple: consequent = c, b, a (antecedents sorted)
    val rules = triples.select(explode(array(
      struct(col("item_a").as("ant_a"), col("item_b").as("ant_b"),
        col("item_c").as("consequent"), col("support")),
      struct(col("item_a").as("ant_a"), col("item_c").as("ant_b"),
        col("item_b").as("consequent"), col("support")),
      struct(col("item_b").as("ant_a"), col("item_c").as("ant_b"),
        col("item_a").as("consequent"), col("support")))).as("r"))
      .select(col("r.*"))
    rules
      .join(pairs, col("ant_a") === col("pa") && col("ant_b") === col("pb"))
      .join(Broadcasts.maybeBroadcast(itemCounts),
        col("consequent") === col("ci"))
      .join(Broadcasts.maybeBroadcast(nBaskets))
      .select(col("ant_a"), col("ant_b"), col("consequent"), col("support"),
        col("pair_support"),
        (col("support").cast("double") / col("pair_support").cast("double"))
          .as("confidence"),
        ((col("support") * col("__nb")).cast("double")
          / (col("pair_support") * col("__cn")).cast("double")).as("lift"))
  }

  def itemsets3(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val baskets = df
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull)
      .distinct()
      .groupBy(col("__b"))
      .agg(sort_array(collect_set(col("__i"))).as("__items"))
      .filter(size(col("__items")) >= 3)
    baskets
      .select(col("__b"), col("__items"),
        posexplode(col("__items")).as(Seq("__pi", "item_a")))
      .select(col("__b"), col("__items"), col("__pi"), col("item_a"),
        posexplode(col("__items")).as(Seq("__pj", "item_b")))
      .filter(col("__pj") > col("__pi"))
      .select(col("__b"), col("__pj"), col("item_a"), col("item_b"),
        posexplode(col("__items")).as(Seq("__pk", "item_c")))
      .filter(col("__pk") > col("__pj"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
