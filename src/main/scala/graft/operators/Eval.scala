package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scored-model evaluation tables — the offline-eval artifacts every
  * model-scoring pipeline materializes next to [[Profile.calibration]]:
  * exact ROC-AUC and the decile gains/lift table. Both inherit the
  * [[RankStats]] discipline: every statistic is a function of the
  * per-key DISTINCT-SCORE aggregate (hash aggregate first, windows
  * only over values-scale frames), with exact integer/decimal
  * arithmetic and one final IEEE division per emitted scalar. */
object Eval {

  /** Exact ROC-AUC per key via the Mann–Whitney identity:
    * `AUC = U⁺/(n⁺·n⁻)` = P(score⁺ > score⁻) + ½·P(tie) — computed
    * from [[RankStats.mannWhitneyU]]'s doubled integers, so ties are
    * exact and no sorting of raw rows happens anywhere. Keys with only
    * one class are dropped (AUC undefined).
    *
    * Output: (key, n_pos, n_neg, auc). */
  def aucByKey(df: DataFrame, keyCol: String, scoreCol: String,
               isPositive: Column): DataFrame =
    RankStats.mannWhitneyU(df, keyCol, scoreCol, isPositive)
      .select(col(keyCol), col("n_a").as("n_pos"), col("n_b").as("n_neg"),
        (col("u_a_doubled").cast("double")
          / (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")))
          .as("auc"))

  /** Micro-scaled log2 position discounts `round(1e6/log2(i+1))` for
    * ranks 1..20, PINNED literals (log2 is libm — the Benford-table
    * discipline: never evaluated in-engine). */
  private val ndcgDiscountMicro: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L,
    315465L, 301030L, 289065L, 278943L, 270238L, 262650L, 255958L,
    250000L, 244651L, 239812L, 235409L, 231378L, 227670L)

  /** NDCG@k over a pre-truncated ranking table (one row per
    * (query, candidate) with its 1-based rank) — completes the
    * retrieval-eval family next to [[rankingReport]]'s hit@k/MRR with
    * the POSITION-GRADED metric: binary relevance, discounts from the
    * pinned micro-integer table (k ≤ 20), so per-query
    * `dcg_micro = Σ_{rel} w_rank` and the ideal
    * `idcg_micro = Σ_{i≤n_rel∧i≤k} w_i` are EXACT BIGINTs,
    * and the corpus rollup reports the exact micro sums with
    * `micro_avg_ndcg = Σdcg/Σidcg` as the ONE division — the
    * MICRO-averaged NDCG, order-free by construction (a float Σ of
    * per-query ndcg ratios would be partition-order-dependent;
    * macro-averaging, if wanted, is a caller-side fold over a
    * per-query emission).
    *
    * Output: one row (n_queries, sum_dcg_micro, sum_idcg_micro,
    * micro_avg_ndcg). */
  def ndcgAtK(ranked: DataFrame, queryCol: String, rankCol: String,
              isRelevant: Column, k: Int): DataFrame =
    ndcgPerQuery(ranked, queryCol, rankCol, isRelevant, k)
      .agg(count(lit(1)).as("n_queries"),
      sum(col("__dcg")).cast("long").as("sum_dcg_micro"),
      sum(col("__idcg")).cast("long").as("sum_idcg_micro"))
      .withColumn("micro_avg_ndcg",
        when(col("sum_idcg_micro") > 0,
          col("sum_dcg_micro").cast("double")
            / col("sum_idcg_micro").cast("double")))

  /** Per-query NDCG@k frame shared by [[ndcgAtK]] (micro rollup) and
    * [[ndcgMacroAtK]]: (`__q`, `__dcg`, `__nrel`, `__idcg`) — exact
    * micro-integer DCG/IDCG per query from the pinned discount table.
    * One hash aggregate over the pre-truncated ranking rows; the
    * discount and ideal-prefix lookups are literal CASE chains
    * (metadata-free, codegen-friendly). */
  private def ndcgPerQuery(ranked: DataFrame, queryCol: String,
                           rankCol: String, isRelevant: Column,
                           k: Int): DataFrame = {
    require(k >= 1 && k <= ndcgDiscountMicro.size,
      s"k must be in [1, ${ndcgDiscountMicro.size}], got $k")
    val w = ndcgDiscountMicro.take(k)
    val discount = w.zipWithIndex.foldLeft(lit(0L)) { case (acc, (wi, i)) =>
      when(col(rankCol) === (i + 1), wi).otherwise(acc)
    }
    val idealPrefix = w.scanLeft(0L)(_ + _) // idcg for n_rel = 0..k
    val idcgOf = idealPrefix.zipWithIndex.foldLeft(lit(idealPrefix.last)) {
      case (acc, (s, n)) => when(col("__nrel") === n, s).otherwise(acc)
    }
    // NULL relevance counts as NOT-relevant (coalesce to false), never
    // as row-dropped: dropping would erase a query whose retained rows
    // are all NULL-labeled from n_queries, while the SQL oracles keep
    // the row and score it non-relevant — same convention here.
    val rel = coalesce(isRelevant, lit(false))
    ranked.filter(col(rankCol) <= k)
      .groupBy(col(queryCol).as("__q"))
      .agg(sum(when(rel, discount).otherwise(0L)).as("__dcg"),
        sum(when(rel, 1L).otherwise(0L)).as("__nrel"))
      .withColumn("__idcg", idcgOf)
  }

  /** MACRO-averaged NDCG@k — every query votes equally, regardless of
    * how many relevant candidates it has (the micro average of
    * [[ndcgAtK]] weights queries by IDCG mass). The order-free trick:
    * each query's ratio is floored onto the micro grid
    * (`ndcg_micro = 1e6·dcg div idcg` — exact integer division of
    * exact BIGINTs, engine-portable), so the corpus sum is an exact
    * BIGINT at any parallelism and the macro mean is ONE final
    * division. Queries with no relevant candidate in the top-k
    * (IDCG = 0, NDCG undefined) are counted in `n_zero_rel` and
    * excluded from the mean — never averaged in as fake zeros.
    *
    * Output: one row (n_queries, n_zero_rel, sum_ndcg_micro,
    * macro_avg_ndcg = Σ/( (n_queries−n_zero_rel)·1e6 ), NULL when every
    * query lacks relevant candidates). */
  def ndcgMacroAtK(ranked: DataFrame, queryCol: String, rankCol: String,
                   isRelevant: Column, k: Int): DataFrame =
    ndcgPerQuery(ranked, queryCol, rankCol, isRelevant, k)
      .withColumn("__nm",
        when(col("__idcg") > 0,
          expr("(1000000 * __dcg) div __idcg")).otherwise(0L))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("__idcg") === 0, 1L).otherwise(0L)).cast("long")
          .as("n_zero_rel"),
        sum(col("__nm")).cast("long").as("sum_ndcg_micro"))
      .withColumn("macro_avg_ndcg",
        when(col("n_queries") > col("n_zero_rel"),
          col("sum_ndcg_micro").cast("double")
            / ((col("n_queries") - col("n_zero_rel")).cast("double")
              * lit(1000000.0))))

  /** DeLong variance parts for [[aucByKey]] — the standard error that
    * turns an AUC point estimate into a confidence interval / paired
    * test (DeLong, DeLong & Clarke-Pearson 1988): per key, the
    * placement sums and sums-of-squares of both structural components,
    * in the repo's DOUBLED-integer convention (a positive at distinct
    * value v has doubled placement `p = 2·(#neg below) + #neg tied`;
    * a negative symmetrically against positives above), computed on
    * the per-key distinct-value lattice — one hash aggregate, two
    * key-partitioned values-scale windows, no raw-row ranks. The
    * doubled sums satisfy `Σca·p = Σcb·q = 2·n_pos·n_neg·AUC` exactly
    * (spec-pinned identity).
    *
    * `var_auc = S10/n_pos + S01/n_neg` with
    * `S10 = (n_pos·Σp² − (Σp)²) / (n_pos·(n_pos−1)·4·n_neg²)` is ONE
    * pinned double chain over the exact BIGINT parts (the q264
    * portability class; the oracle mirrors the same operation order).
    * BIGINT bounds: Σp ≤ 2·n_pos·n_neg (~3e9 rows/side), Σp² ≤
    * n_pos·4·n_neg² — exact while n_pos·n_neg² ≤ ~2e18 (e.g. 1e6 pos ×
    * 1e6 neg); past that the ANSI cast fails loudly. Keys needing a
    * variance (n_pos ≥ 2 and n_neg ≥ 2) emit it; smaller keys emit
    * NULL. Keys with an empty class drop (AUC undefined).
    *
    * Output: (key, n_pos, n_neg, sum_v10_doubled, sum_v10_sq,
    * sum_v01_doubled, sum_v01_sq, auc, var_auc). */
  def deLongVariance(df: DataFrame, keyCol: String, scoreCol: String,
                     isPositive: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val counts = RankStats.splitCounts(df, keyCol, scoreCol, isPositive)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = counts.groupBy(col(keyCol))
      .agg(sum(col("__ca")).as("n_pos"), sum(col("__cb")).as("n_neg"))
    val placed = counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .join(Broadcasts.maybeBroadcast(totals), Seq(keyCol))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .withColumn("__p",
        (lit(2L) * (col("__cumb") - col("__cb")) + col("__cb")).cast(d38))
      .withColumn("__q",
        (lit(2L) * (col("n_pos") - col("__cuma")) + col("__ca")).cast(d38))
    val parts = placed.groupBy(col(keyCol))
      .agg(max(col("n_pos")).as("n_pos"), max(col("n_neg")).as("n_neg"),
        sum(col("__ca").cast(d38) * col("__p")).cast(d38).cast("long")
          .as("sum_v10_doubled"),
        sum(col("__ca").cast(d38) * col("__p") * col("__p")).cast(d38)
          .cast("long").as("sum_v10_sq"),
        sum(col("__cb").cast(d38) * col("__q")).cast(d38).cast("long")
          .as("sum_v01_doubled"),
        sum(col("__cb").cast(d38) * col("__q") * col("__q")).cast(d38)
          .cast("long").as("sum_v01_sq"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    // pinned double chains (identical operation order in the oracle)
    val s10 = (np * col("sum_v10_sq").cast("double") -
      col("sum_v10_doubled").cast("double")
        * col("sum_v10_doubled").cast("double")) /
      (np * (np - lit(1.0)))
    val s01 = (nn * col("sum_v01_sq").cast("double") -
      col("sum_v01_doubled").cast("double")
        * col("sum_v01_doubled").cast("double")) /
      (nn * (nn - lit(1.0)))
    parts
      .withColumn("auc",
        col("sum_v10_doubled").cast("double")
          / (lit(2.0) * np * nn))
      .withColumn("var_auc",
        when(col("n_pos") > 1 && col("n_neg") > 1,
          s10 / (lit(4.0) * nn * nn) / np + s01 / (lit(4.0) * np * np) / nn))
  }

  /** Average precision at k per query over a pre-truncated ranking
    * table (one row per (query, candidate) with its UNIQUE 1-based
    * rank ≤ k per query — the [[ndcgAtK]] input contract): the exact
    * fixed-point trick is scaling by 2520 = lcm(1..10), so every
    * precision term `hits_i / i` (i ≤ k ≤ 10) is an exact integer
    * `hits_i · (2520 div i)` and the per-query AP numerator
    * `ap_scaled = Σ_{relevant i} 2520·hits_i/i` is an exact BIGINT —
    * no float sum anywhere. The denominator is the number of relevant
    * candidates IN the list (r_k), the standard AP@k convention for
    * truncated rankings. The one window is per-query over ≤k rows
    * (key-partitioned, bounded by construction).
    *
    * Output per query: (query, n_eval, r_k, ap_scaled,
    * ap = ap_scaled/(2520·r_k), NULL when r_k = 0). */
  def averagePrecisionAtK(ranked: DataFrame, queryCol: String,
                          rankCol: String, isRelevant: Column,
                          k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"k must be in [1, 10], got $k")
    val w = Window.partitionBy(col(queryCol)).orderBy(col(rankCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL relevance = not-relevant (see ndcgPerQuery): the row stays in
    // n_eval and the rank sequence, matching the SQL-oracle convention.
    ranked.filter(col(rankCol) <= k)
      .withColumn("__rel",
        when(coalesce(isRelevant, lit(false)), 1L).otherwise(0L))
      .withColumn("__hits", sum(col("__rel")).over(w))
      .withColumn("__term",
        when(col("__rel") === 1L,
          expr(s"(2520 * __hits) div $rankCol")).otherwise(0L))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(col("__rel")).cast("long").as("r_k"),
        sum(col("__term")).cast("long").as("ap_scaled"))
      .withColumn("ap",
        when(col("r_k") > 0,
          col("ap_scaled").cast("double")
            / (lit(2520.0) * col("r_k").cast("double"))))
  }

  /** Mean average precision at k — the macro rollup of
    * [[averagePrecisionAtK]]: each query's AP floors onto the micro
    * grid (`ap_micro = 1e6·ap_scaled div (2520·r_k)` — exact integer
    * division), queries with no relevant candidate contribute 0 (the
    * standard MAP convention: a retrieval that found nothing scores
    * zero, unlike NDCG where the ideal is undefined), and the corpus
    * sum is an exact BIGINT — order-free, one final division.
    *
    * Output: one row (n_queries, n_with_hits, sum_ap_micro,
    * macro_map = Σ/(n_queries·1e6)). */
  def mapAtK(ranked: DataFrame, queryCol: String, rankCol: String,
             isRelevant: Column, k: Int): DataFrame =
    averagePrecisionAtK(ranked, queryCol, rankCol, isRelevant, k)
      .withColumn("__apm",
        when(col("r_k") > 0,
          expr("(1000000 * ap_scaled) div (2520 * r_k)")).otherwise(0L))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("r_k") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_with_hits"),
        sum(col("__apm")).cast("long").as("sum_ap_micro"))
      .withColumn("macro_map",
        when(col("n_queries") > 0,
          col("sum_ap_micro").cast("double")
            / (col("n_queries").cast("double") * lit(1000000.0))))

  /** Fleiss' kappa — multi-rater chance-corrected agreement (the
    * annotation-QA statistic for LLM-labeling pipelines where
    * [[cohenKappa]]'s two fixed raters don't apply): items each
    * receive exactly `n` categorical ratings (VALIDATED in-plan — a
    * ragged item raises; subsample or pad upstream), and
    * `κ = (P̄_o − P̄_e)/(1 − P̄_e)` with
    * `P̄_o = Σ_i Σ_c c_ic(c_ic−1) / (N·n·(n−1))` and
    * `P̄_e = Σ_c (Σ_i c_ic)² / (N·n)²` — all four quantities exact
    * integers (decimal internally, BIGINT out; the P̄_e numerator is
    * ≤ (N·n)², within BIGINT while N·n ≤ ~3e9 — past that the ANSI
    * cast fails loudly), κ the one fixed double chain. Degenerate
    * (P̄_e = 1) yields NULL.
    *
    * Materialization bound: the (item, category) cell frame is
    * `localCheckpoint`ed for its three consumers — that frame is
    * RATING-TABLE scale (≤ N·n rows, one per observed item×category
    * cell), NOT values-scale. Fine for the stated annotation-QA
    * domain (items × a small label set); for a corpus where N·n
    * rivals the raw event count, drop the checkpoint and accept the
    * 3× lineage replay, or persist to disk instead — the same
    * documented-collect convention as [[graft.operators.Robust]]'s
    * poissonBootstrap/bootstrapCI.
    *
    * Output: one row (n_items, n_ratings, po_num, pe_num, kappa). */
  /** Cronbach's alpha — internal-consistency reliability of k numeric
    * item columns (the survey/rubric-QC classic beside
    * [[fleissKappa]]/[[krippendorffAlpha]]'s categorical agreement):
    * `α = k/(k−1) · (1 − Σ_i Var(item_i) / Var(Σ_i item_i))`. On the
    * cents lattice every variance NUMERATOR `n·Σx² − (Σx)²` is an
    * exact integer (decimal-held) and the common `n(n−1)` denominator
    * CANCELS in the ratio, so α is one fixed double chain over exact
    * parts — emitted alongside them (ss_items_d, ss_total_d) so the
    * oracle pins both. ONE aggregate pass; rows with any NULL item
    * are dropped (listwise, the matrix convention). α is NULL when
    * the total variance vanishes. */
  def cronbachAlpha(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 item columns, got ${cols.size}")
    val d38 = "decimal(38,0)"
    val base = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        (col(c).cast("decimal(12,2)") * 100).cast("long").as(s"__c_$c"))
        : _*)
      .withColumn("__tot", cols.map(c => col(s"__c_$c")).reduce(_ + _))
    val aggs = count(lit(1)).cast("long").as("n") +:
      (cols.map(c => Seq(
        sum(col(s"__c_$c").cast(d38)).cast(d38).as(s"__s_$c"),
        sum((col(s"__c_$c") * col(s"__c_$c")).cast(d38)).cast(d38)
          .as(s"__ss_$c"))).flatten ++ Seq(
        sum(col("__tot").cast(d38)).cast(d38).as("__st"),
        sum((col("__tot") * col("__tot")).cast(d38)).cast(d38)
          .as("__sst")))
    val m = base.agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast(d38)
    def ssNum(s: org.apache.spark.sql.Column,
              ss: org.apache.spark.sql.Column) =
      (nD * ss - s * s).cast(d38).cast("double")
    val itemSs = cols.map(c =>
      ssNum(col(s"__s_$c"), col(s"__ss_$c"))).reduce(_ + _)
    val totSs = ssNum(col("__st"), col("__sst"))
    m.select(col("n"), lit(cols.size.toLong).as("k_items"),
      itemSs.as("ss_items_d"), totSs.as("ss_total_d"))
      .withColumn("alpha",
        when(col("ss_total_d") > 0.0,
          (lit(cols.size.toDouble) / (cols.size - 1).toDouble)
            * (lit(1.0) - col("ss_items_d") / col("ss_total_d"))))
  }

  /** Scott's π and Gwet's AC1 — the two-rater chance-corrected
    * agreement pair completing the family around [[cohenKappa]]
    * (Cohen's expectation multiplies the raters' OWN margins; Scott
    * pools them — the paradox-prone high-prevalence case — and Gwet's
    * AC1 is the prevalence-ROBUST correction reviewers ask for when
    * kappa collapses on skewed labels). With A = Σ diagonal cells,
    * B = Σ_q (r_q + c_q)² over the category union, N rows and k
    * categories, both reduce to exact-BIGINT ratios:
    *
    *   π   = (4·N·A − B) / (4·N² − B)
    *   AC1 = (4·N·A·(k−1) − 4·N² + B) / (4·N²·(k−1) − 4·N² + B)
    *
    * (Gwet's Pe = (1 − B/4N²)/(k−1), using Σπ_q = 1.) One cells
    * aggregate + level-scale margins; each statistic is one double
    * division over exact longs. Output: (n, k_cats, diag_sum,
    * margin_sq_sum, scott_pi, gwet_ac1) — NULLs when a denominator
    * vanishes (all mass on one category for π; k = 1 for AC1). */
  def agreementCoefficients(df: DataFrame, aCol: String,
                            bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // consumed by diag, margins, total
    val n = cells.agg(sum(col("__n")).cast("long").as("n"))
    val diag = cells.filter(col("__a") === col("__b"))
      .agg(coalesce(sum(col("__n")), lit(0L)).cast("long").as("diag_sum"))
    val ra = cells.groupBy(col("__a").as("__q"))
      .agg(sum(col("__n")).as("__r"))
    val cb = cells.groupBy(col("__b").as("__q"))
      .agg(sum(col("__n")).as("__c"))
    val margins = ra.join(cb, Seq("__q"), "full")
      .select(col("__q"),
        (coalesce(col("__r"), lit(0L)) + coalesce(col("__c"), lit(0L)))
          .as("__m"))
      .agg(count(lit(1)).cast("long").as("k_cats"),
        sum((col("__m").cast(d38) * col("__m")).cast(d38)).cast(d38)
          .cast("long").as("margin_sq_sum"))
    n.crossJoin(broadcast(diag)).crossJoin(broadcast(margins))
      .withColumn("scott_pi", {
        val num = (lit(4L).cast(d38) * col("n") * col("diag_sum"))
          .cast(d38).cast("long") - col("margin_sq_sum")
        val den = (lit(4L).cast(d38) * col("n") * col("n")).cast(d38)
          .cast("long") - col("margin_sq_sum")
        when(den =!= 0L, num.cast("double") / den.cast("double"))
      })
      .withColumn("gwet_ac1", {
        val n2x4 = (lit(4L).cast(d38) * col("n") * col("n")).cast(d38)
          .cast("long")
        val num = ((lit(4L).cast(d38) * col("n") * col("diag_sum")
          * (col("k_cats") - 1)).cast(d38).cast("long")
          - n2x4) + col("margin_sq_sum")
        val den = ((n2x4.cast(d38) * (col("k_cats") - 1)).cast(d38)
          .cast("long") - n2x4) + col("margin_sq_sum")
        when(col("k_cats") > 1L && den =!= 0L,
          num.cast("double") / den.cast("double"))
      })
      .select(col("n"), col("k_cats"), col("diag_sum"),
        col("margin_sq_sum"), col("scott_pi"), col("gwet_ac1"))
  }

  /** ICC(C,1) — the consistency intraclass correlation for a FIXED
    * rater/item panel (Shrout & Fleiss ICC(3,1) / McGraw & Wong
    * ICC(C,1)): subjects are rows, the k item columns are the raters,
    * and the question is "how consistently do the items order the
    * subjects?" — [[cronbachAlpha]]'s single-rating sibling (Spearman–
    * Brown: α = k·ICC/(1 + (k−1)·ICC), spec-pinned). Two-way ANOVA on
    * the cents lattice with every sum-of-squares numerator EXACT — the
    * nk-cleared forms
    *
    *   B = n·ΣRᵢ² − T²  (subjects), C = k·ΣCⱼ² − T²  (items),
    *   E = nk·Σx² − n·ΣRᵢ² − k·ΣCⱼ² + T²  (residual)
    *
    * ride decimal(38,0) (they overflow BIGINT at corpus scale) and are
    * emitted as correctly-rounded doubles (oracle mirrors VARCHAR-
    * route the HUGEINTs);
    * `ICC = (B·(k−1) − E) / ((k−1)·(B + E))` is one fixed double
    * chain. ONE aggregate pass; listwise NULL deletion. Output:
    * (n, k_items, ss_rows_d, ss_cols_d, ss_err_d, icc) — NULL icc on
    * a degenerate table (B + E = 0). */
  def iccConsistency(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 item columns, got ${cols.size}")
    val d38 = "decimal(38,0)"
    val k = cols.size
    val base = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        (col(c).cast("decimal(12,2)") * 100).cast("long").as(s"__c_$c"))
        : _*)
      .withColumn("__tot", cols.map(c => col(s"__c_$c")).reduce(_ + _))
    val aggs = count(lit(1)).cast("long").as("n") +:
      (cols.map(c => Seq(
        sum(col(s"__c_$c").cast(d38)).cast(d38).as(s"__s_$c"),
        sum((col(s"__c_$c") * col(s"__c_$c")).cast(d38)).cast(d38)
          .as(s"__ss_$c"))).flatten ++ Seq(
        sum(col("__tot").cast(d38)).cast(d38).as("__st"),
        sum((col("__tot") * col("__tot")).cast(d38)).cast(d38)
          .as("__sst")))
    val m = base.agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast(d38)
    val sx2 = cols.map(c => col(s"__ss_$c")).reduce(_ + _).cast(d38)
    val scj2 = cols.map(c => (col(s"__s_$c") * col(s"__s_$c")).cast(d38))
      .reduce(_ + _).cast(d38)
    val t2 = (col("__st") * col("__st")).cast(d38)
    val b = (nD * col("__sst") - t2).cast(d38)
    val c = (lit(k.toLong).cast(d38) * scj2 - t2).cast(d38)
    val e = (nD * lit(k.toLong) * sx2 - nD * col("__sst")
      - lit(k.toLong).cast(d38) * scj2 + t2).cast(d38)
    m.select(col("n"), lit(k.toLong).as("k_items"),
        b.cast("double").as("ss_rows_d"), c.cast("double").as("ss_cols_d"),
        e.cast("double").as("ss_err_d"))
      .withColumn("icc", {
        val den = lit((k - 1).toDouble) *
          (col("ss_rows_d") + col("ss_err_d"))
        when(den > 0.0,
          (col("ss_rows_d") * (k - 1).toDouble - col("ss_err_d")) / den)
      })
  }

  def fleissKappa(df: DataFrame, itemCol: String,
                  categoryCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol), col(categoryCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__k"))
      .localCheckpoint(true) // consumed 3x (per-item, per-cat, totals)
    val perItem = cells.groupBy(col(itemCol))
      .agg(sum(col("__k")).as("__n"),
        sum(col("__k").cast(d38) * (col("__k") - 1)).cast(d38).as("__agree"))
    val check = perItem.agg(
      count(lit(1)).as("n_items"),
      min(col("__n")).as("__nmin"), max(col("__n")).as("__nmax"),
      sum(col("__agree")).cast(d38).cast("long").as("po_num"))
      .withColumn("n_ratings",
        when(col("__nmin") =!= col("__nmax"), raise_error(lit(
          "fleissKappa: ragged rating counts — every item must have " +
            "exactly n ratings; subsample or pad upstream")))
          .otherwise(col("__nmax")).cast("long"))
    val perCat = cells.groupBy(col("__c")).agg(sum(col("__k")).as("__m"))
      .agg(sum(col("__m").cast(d38) * col("__m")).cast(d38).cast("long")
        .as("pe_num"))
    check.crossJoin(broadcast(perCat))
      .select(col("n_items"), col("n_ratings"), col("po_num"), col("pe_num"))
      .withColumn("kappa", {
        val nn = col("n_items").cast("double") * col("n_ratings").cast("double")
        val po = col("po_num").cast("double") /
          (nn * (col("n_ratings") - 1).cast("double"))
        val pe = col("pe_num").cast("double") / (nn * nn)
        // n=1 has no within-item pairs (P_o undefined); P_e=1 is the
        // single-category degenerate — both NULL, never a 0/0
        when(col("n_ratings") > 1 && pe < 1.0, (po - pe) / (lit(1.0) - pe))
      })
  }

  /** Krippendorff's alpha (nominal) — the agreement coefficient for
    * VARIABLE rater counts and missing ratings, which is exactly where
    * [[fleissKappa]]'s fixed-n contract raises (division of labor:
    * every item rated by the same n raters → Fleiss; ragged/partial
    * annotation — the common crowd-labeling shape — → this):
    * `α = 1 − D_o/D_e` with observed disagreement
    * `D_o ∝ Σ_i (m_i² − Σ_c n_ic²)/(m_i − 1)` and expected
    * `D_e ∝ (N² − Σ_c N_c²)/(N − 1)` over the pooled margins.
    *
    * Exactness: the per-item rational denominators (m_i − 1) clear
    * against the pinned constant `L = lcm(1..20) = 232792560`, so the
    * observed-disagreement sum is an EXACT BIGINT
    * (`Σ_i (m_i²−Σn²)·(L div (m_i−1))`) — which requires m_i ≤ 21
    * (raised in-plan; realistic annotation has single-digit raters) —
    * and `α = 1 − ((N−1)·do_num)/(L·de_num)` is one fixed double
    * chain. Items with m_i < 2 are dropped entirely (their ratings
    * leave N and the margins — Krippendorff's own rule: a unit no one
    * can disagree on carries no information).
    *
    * Materialization bound: the (item, category) cell frame is
    * checkpointed for its consumers — RATING-TABLE scale, same
    * convention as [[fleissKappa]].
    *
    * Output: one row (n_items, n_ratings, do_num, de_num, alpha) —
    * alpha NULL when D_e = 0 (single observed category) or no item
    * has ≥ 2 ratings. */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        categoryCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val L = 232792560L // lcm(1..20): clears every (m_i - 1) ≤ 20
    val cells = df.filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol), col(categoryCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__k"))
      .localCheckpoint(true) // rating-table scale (fleissKappa convention)
    val perItem = cells.groupBy(col(itemCol))
      .agg(sum(col("__k")).cast("long").as("__m"),
        sum(col("__k").cast(d38) * col("__k")).cast(d38).cast("long")
          .as("__ssq"))
      .filter(col("__m") >= 2)
      .withColumn("__m",
        when(col("__m") > 21, raise_error(lit(
          "krippendorffAlpha: more than 21 ratings on one item — the " +
            "lcm(1..20) exact-denominator regime is exceeded; " +
            "subsample raters upstream"))).otherwise(col("__m")))
      .localCheckpoint(true) // item-scale; consumed for margins + sums
    val so = perItem.agg(
      count(lit(1)).cast("long").as("n_items"),
      sum(col("__m")).cast("long").as("n_ratings"),
      sum((col("__m").cast(d38) * col("__m") - col("__ssq"))
        * expr(s"${L}L div (__m - 1)")).cast(d38).cast("long").as("do_num"))
    // pooled category margins over KEPT items only
    val de = cells.join(perItem.select(col(itemCol)), Seq(itemCol))
      .groupBy(col("__c")).agg(sum(col("__k")).as("__nc"))
      .agg(sum(col("__nc").cast(d38) * col("__nc")).cast(d38).cast("long")
        .as("__sncsq"))
    so.crossJoin(broadcast(de))
      .withColumn("de_num",
        (col("n_ratings").cast(d38) * col("n_ratings") - col("__sncsq"))
          .cast(d38).cast("long"))
      .withColumn("alpha",
        when(col("de_num") > 0,
          lit(1.0) -
            ((col("n_ratings") - 1).cast(d38) * col("do_num")).cast(d38)
              .cast("double")
              / (lit(L).cast(d38) * col("de_num")).cast(d38).cast("double")))
      .select(col("n_items"), col("n_ratings"), col("do_num"),
        col("de_num"), col("alpha"))
  }

  /** Per-item preference/label vote profile — the first QC table over
    * pairwise-preference or multi-label annotation data (RLHF reward
    * corpora, crowd labels): per item, the vote counts, the MAJORITY
    * choice under the deterministic argmax rule (most votes, ties →
    * smallest choice — the engine's mode convention), and its share.
    * One (item, choice) aggregate + a per-item values-scale window.
    *
    * A rater voting twice counts twice (the table records BALLOTS;
    * dedupe (item, rater) upstream for one-vote-per-rater semantics).
    *
    * Output per item: (item, n_ratings, n_choices, majority_choice,
    * majority_votes, majority_share). */
  def preferenceStats(df: DataFrame, itemCol: String,
                      choiceCol: String): DataFrame = {
    val votes = df.filter(col(itemCol).isNotNull && col(choiceCol).isNotNull)
      .groupBy(col(itemCol), col(choiceCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__v"))
    val w = Window.partitionBy(col(itemCol))
      .orderBy(col("__v").desc, col("__c").asc)
    votes
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(itemCol))
      .agg(sum(col("__v")).cast("long").as("n_ratings"),
        count(lit(1)).cast("long").as("n_choices"),
        max(when(col("__rn") === 1, col("__c"))).as("majority_choice"),
        max(when(col("__rn") === 1, col("__v"))).cast("long")
          .as("majority_votes"))
      .withColumn("majority_share",
        col("majority_votes").cast("double") / col("n_ratings").cast("double"))
  }

  /** Per-rater agreement with the item majority — the annotator-QC
    * rollup of [[preferenceStats]] (a rater far below the corpus
    * agreement rate is a spammer, a misread guideline, or a genuinely
    * ambiguous-slice specialist — all worth a look before their labels
    * train anything): each ballot is scored against its item's
    * majority (the rater's OWN vote included — the simple convention,
    * stated here because leave-one-out shifts majorities on small
    * items; compare raters against the same yardstick, not each their
    * own). Single-ballot items are excluded (agreement with yourself
    * alone is noise).
    *
    * Output per rater: (rater, n_ballots, n_agree, agree_share). */
  def annotatorAgreement(df: DataFrame, itemCol: String, raterCol: String,
                         choiceCol: String): DataFrame = {
    val base = df.filter(col(itemCol).isNotNull && col(choiceCol).isNotNull
      && col(raterCol).isNotNull)
    val maj = preferenceStats(base, itemCol, choiceCol)
      .filter(col("n_ratings") >= 2)
      .select(col(itemCol), col("majority_choice"))
    base.join(maj, Seq(itemCol))
      .groupBy(col(raterCol))
      .agg(count(lit(1)).cast("long").as("n_ballots"),
        sum(when(col(choiceCol).cast("string") === col("majority_choice"),
          1L).otherwise(0L)).cast("long").as("n_agree"))
      .withColumn("agree_share",
        col("n_agree").cast("double") / col("n_ballots").cast("double"))
  }

  /** Lin's concordance correlation coefficient per key — "do paired
    * continuous measurements AGREE?" (Pearson r rewards any linear
    * relation; CCC additionally penalizes scale and location shifts —
    * the agreement statistic for model-vs-model score comparison or
    * repeated measurements; Lin 1989): with population moments,
    * `ccc = 2·cov(x,y) / (var x + var y + (x̄ − ȳ)²)`. Multiplying
    * num/den through by n² clears every division:
    * `num = 2·(n·Σxy − Σx·Σy)`, `den = (n·Σx² − (Σx)²) + (n·Σy² −
    * (Σy)²) + (Σx − Σy)²` — ALL exact cent-grid integers (decimal
    * internally; BIGINT out with the [[graft.operators.Robust
    * .welchTTest]] magnitude bounds), and ccc is the ONE division.
    * Degenerate pairs (den = 0: both constant and equal-mean) give
    * NULL.
    *
    * Output per key: (key, n, ccc_num, ccc_den, ccc). */
  def linConcordance(df: DataFrame, keyCol: String, xCol: String,
                     yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol),
        (col(xCol).cast("decimal(12,2)") * 100).cast("long").as("__x"),
        (col(yCol).cast("decimal(12,2)") * 100).cast("long").as("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__x")).cast("long").as("__sx"),
        sum(col("__y")).cast("long").as("__sy"),
        sum(col("__x").cast(d38) * col("__x")).cast(d38).as("__sxx"),
        sum(col("__y").cast(d38) * col("__y")).cast(d38).as("__syy"),
        sum(col("__x").cast(d38) * col("__y")).cast(d38).as("__sxy"))
      .withColumn("ccc_num",
        (lit(2L).cast(d38) * (col("n").cast(d38) * col("__sxy")
          - col("__sx").cast(d38) * col("__sy"))).cast(d38).cast("long"))
      .withColumn("ccc_den",
        ((col("n").cast(d38) * col("__sxx")
          - col("__sx").cast(d38) * col("__sx"))
          + (col("n").cast(d38) * col("__syy")
            - col("__sy").cast(d38) * col("__sy"))
          + (col("__sx") - col("__sy")).cast(d38)
            * (col("__sx") - col("__sy"))).cast(d38).cast("long"))
      .withColumn("ccc",
        when(col("ccc_den") > 0,
          col("ccc_num").cast("double") / col("ccc_den").cast("double")))
      .select(col(keyCol), col("n"), col("ccc_num"), col("ccc_den"),
        col("ccc"))
  }

  /** Exact Brier score — the proper scoring rule for probability
    * forecasts (log-loss needs libm; Brier is pure arithmetic): with
    * scores on the [[Profile.calibration]] micro grid (exact-scaled via
    * decimal — off-grid inputs quantize exactly, out-of-[0,1] rows
    * drop), `Σ (label·1e6 − score_micro)²` is an exact integer
    * (decimal internally — per-row terms reach 1e12, the sum overflows
    * BIGINT only past ~9e6 rows per key if emitted raw, so it is
    * emitted in micro² units as BIGINT with the documented ≤9e6·1e12
    * bound — past that the ANSI cast fails loudly) and
    * `brier = num / (n·1e12)` is the one division.
    *
    * Output: (key, n, brier_num, brier). */
  def brierScore(df: DataFrame, keyCol: String, scoreCol: String,
                 isPositive: Column): DataFrame = {
    val sm = (col(scoreCol).cast("decimal(20,6)") * 1000000).cast("long")
    df.filter(col(scoreCol).isNotNull && isPositive.isNotNull)
      .select(col(keyCol), sm.as("__sm"),
        when(isPositive, 1000000L).otherwise(0L).as("__y"))
      .filter(col("__sm") >= 0 && col("__sm") <= 1000000L)
      .withColumn("__d", col("__y") - col("__sm"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum((col("__d").cast("decimal(38,0)") * col("__d"))
          .cast("decimal(38,0)")).cast("decimal(38,0)").cast("long")
          .as("brier_num"))
      .withColumn("brier",
        col("brier_num").cast("double")
          / (col("n").cast("double") * 1.0e12))
  }

  /** Qini (uplift) curve at every distinct score threshold — the
    * targeting-model eval [[gainsTable]] cannot express: with a
    * TREATED flag alongside the outcome, the question is not "does the
    * top decile convert" but "does it convert BECAUSE we treated it".
    * At each distinct score (descending, "target when score ≥ t"):
    * cumulative treated/control volumes and responders, plus the Qini
    * numerator `q_num = cum_t_pos·cum_c − cum_c_pos·cum_t` (exact
    * cross products — decimal internally, BIGINT out, the engine's
    * uplift in responders at that cutoff scaled by cum_t·cum_c) and
    * `uplift = q_num/(cum_t·cum_c)` as the one division (the
    * treated-rate minus control-rate difference). Same distinct-score
    * lattice contract as [[prCurve]] ([[quantizeScores]] for
    * continuous scores); NULL score/flag/outcome rows drop.
    *
    * Output: (threshold, cum_t, cum_t_pos, cum_c, cum_c_pos, q_num,
    * uplift — NULL until both arms appear). */
  def qiniCurve(df: DataFrame, scoreCol: String, isTreated: Column,
                isPositive: Column): DataFrame = {
    val perScore = df.filter(col(scoreCol).isNotNull
      && isTreated.isNotNull && isPositive.isNotNull)
      .groupBy(col(scoreCol).as("threshold"))
      .agg(sum(when(isTreated, 1L).otherwise(0L)).as("__t"),
        sum(when(isTreated && isPositive, 1L).otherwise(0L)).as("__tp"),
        sum(when(!isTreated, 1L).otherwise(0L)).as("__c"),
        sum(when(!isTreated && isPositive, 1L).otherwise(0L)).as("__cp"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("cum_t", sum(col("__t")).over(w).cast("long"))
      .withColumn("cum_t_pos", sum(col("__tp")).over(w).cast("long"))
      .withColumn("cum_c", sum(col("__c")).over(w).cast("long"))
      .withColumn("cum_c_pos", sum(col("__cp")).over(w).cast("long"))
      .withColumn("q_num",
        (col("cum_t_pos").cast("decimal(38,0)") * col("cum_c")
          - col("cum_c_pos").cast("decimal(38,0)") * col("cum_t"))
          .cast("decimal(38,0)").cast("long"))
      .withColumn("uplift",
        when(col("cum_t") > 0 && col("cum_c") > 0,
          col("q_num").cast("double")
            / (col("cum_t").cast("double") * col("cum_c").cast("double"))))
      .select(col("threshold"), col("cum_t"), col("cum_t_pos"),
        col("cum_c"), col("cum_c_pos"), col("q_num"), col("uplift"))
  }

  /** Pinball (quantile) loss per key — the eval for quantile
    * forecasts (P50/P90 capacity planning, the
    * [[graft.operators.Timeseries.seasonalNaiveBacktest]] family at a
    * quantile other than the median):
    * `L_q(e) = max(q·e, (q−1)·e)` over error `e = actual − forecast`.
    * With q the RATIONAL `qNum/qDen` and errors on the 2-dp money grid
    * (cast to cent units), `qDen·100·Σ L_q` is an EXACT BIGINT —
    * emitted as `pinball_num` with the one final division giving the
    * mean loss. Inputs off the 2-dp grid violate the documented
    * contract (ANSI decimal cast throws — loud).
    *
    * Output: (key, n, pinball_num, mean_pinball) where
    * `mean_pinball = pinball_num / (n·qDen·100)`. */
  def pinballLoss(df: DataFrame, keyCol: String, actualCol: String,
                  forecastCol: String, qNum: Int, qDen: Int): DataFrame = {
    require(qDen > 0 && qNum > 0 && qNum < qDen,
      s"quantile must be a rational in (0,1): got $qNum/$qDen")
    val eCents = (col(actualCol).cast("decimal(12,2)") * 100).cast("long") -
      (col(forecastCol).cast("decimal(12,2)") * 100).cast("long")
    val term = greatest(lit(qNum.toLong) * eCents,
      lit((qNum - qDen).toLong) * eCents)
    df.filter(col(actualCol).isNotNull && col(forecastCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(term.cast("decimal(38,0)")).cast("decimal(38,0)").cast("long")
          .as("pinball_num"))
      .withColumn("mean_pinball",
        col("pinball_num").cast("double")
          / (col("n").cast("double") * lit(qDen * 100.0)))
  }

  /** Split-conformal calibration quantile per key: the
    * `⌈(n+1)(1−α)⌉`-th smallest calibration residual — the `q̂` that
    * makes `[pred − q̂, pred + q̂]` a finite-sample (1−α) prediction
    * interval under exchangeability (the distribution-free guarantee;
    * Vovk et al.'s split-conformal recipe). α arrives as the RATIONAL
    * `alphaNum/alphaDen` so the rank threshold
    * `k = ⌈(n+1)·(alphaDen−alphaNum)/alphaDen⌉` is exact integer
    * arithmetic (the q216 rational-threshold-quantile discipline — no
    * float rank, no interpolation). q̂ is the smallest DISTINCT
    * residual whose cumulative count reaches k, found on the per-key
    * distinct-value lattice; keys where k > n (α too small for the
    * calibration size) emit NULL q̂ — the honest "need more
    * calibration data" signal, never a clamped value.
    *
    * Output: (key, n, k_rank, qhat). */
  def conformalQuantile(df: DataFrame, keyCol: String, residualCol: String,
                        alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1): got $alphaNum/$alphaDen")
    val counts = df.filter(col(residualCol).isNotNull)
      .groupBy(col(keyCol), col(residualCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .join(Broadcasts.maybeBroadcast(
        counts.groupBy(col(keyCol)).agg(sum(col("__c")).as("n"))), Seq(keyCol))
      .withColumn("k_rank",
        expr(s"(((n + 1) * ${alphaDen - alphaNum}) + ${alphaDen - 1}) div $alphaDen")
          .cast("long"))
      .groupBy(col(keyCol), col("n"), col("k_rank"))
      .agg(min(when(col("__cum") >= col("k_rank"), col("__v"))).as("qhat"))
      .select(col(keyCol), col("n"), col("k_rank"), col("qhat"))
  }

  /** [[conformalQuantile]]'s finishing step over a PRE-AGGREGATED
    * distinct-residual count table `(residual, cnt)` — the mergeable
    * partial the streaming conformal monitor
    * ([[graft.streaming.Streaming.conformalMonitorSink]]) maintains
    * (same-residual counts from different batches just sum). Global
    * (single-population) form: one ordered window over the
    * distinct-value lattice, exact rational rank threshold.
    *
    * Output: one row (n, k_rank, qhat — NULL when k_rank > n). */
  def conformalQuantileFromCounts(counts: DataFrame, alphaNum: Int,
                                  alphaDen: Int): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1): got $alphaNum/$alphaDen")
    val w = Window.orderBy(col("residual").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(
        counts.agg(sum(col("cnt")).cast("long").as("n"))))
      .withColumn("k_rank",
        expr(s"(((n + 1) * ${alphaDen - alphaNum}) + ${alphaDen - 1}) div $alphaDen")
          .cast("long"))
      .groupBy(col("n"), col("k_rank"))
      .agg(min(when(col("__cum") >= col("k_rank"), col("residual")))
        .as("qhat"))
      .select(col("n"), col("k_rank"), col("qhat"))
  }

  /** Empirical coverage of the conformal interval on a TEST frame:
    * joins each key's `qhat` ([[conformalQuantile]]) and counts test
    * rows whose residual is ≤ q̂ — `coverage = n_covered/n_test`, one
    * exact division. Keys with NULL q̂ report NULL coverage (the
    * interval is infinite/undefined, not 100%-by-accident). */
  def conformalCoverage(test: DataFrame, keyCol: String,
                        residualCol: String, qhat: DataFrame): DataFrame =
    test.filter(col(residualCol).isNotNull)
      .join(Broadcasts.maybeBroadcast(
        qhat.select(col(keyCol), col("qhat"))), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col(residualCol) <= col("qhat"), 1L).otherwise(0L))
          .cast("long").as("n_covered"),
        max(col("qhat").isNull.cast("int")).as("__noq"))
      .withColumn("coverage",
        when(col("__noq") === 0,
          col("n_covered").cast("double") / col("n_test").cast("double")))
      .drop("__noq")

  /** Pre-quantizer for the distinct-score lattice operators
    * ([[prCurve]], [[gainsTable]], [[aucByKey]]): replaces `scoreCol`
    * with `floor(score/grid)·grid`, collapsing a genuinely continuous
    * score — where every row is distinct, the "values-scale" lattice
    * degenerates to row scale, and the ordered window becomes exactly
    * the global raw-row sort these operators exist to avoid — to at
    * most range/grid distinct values. The chain is one correctly-
    * rounded division, an exact floor, one correctly-rounded multiply:
    * bit-identical on every IEEE engine (the q264 portability class),
    * so quantized thresholds are oracle-safe. Thresholds are reported
    * at grid resolution — the eval tables are decile/cutoff-granular
    * anyway, so grid ≈ the smallest score difference anyone acts on
    * (1e-4 for probabilities keeps ≤10k lattice values at any row
    * count). NULL scores stay NULL. */
  def quantizeScores(df: DataFrame, scoreCol: String, grid: Double): DataFrame = {
    require(grid > 0, s"grid must be positive, got $grid")
    df.withColumn(scoreCol, floor(col(scoreCol) / grid) * grid)
  }

  /** Precision/recall curve at every DISTINCT score threshold
    * ("predict positive when score ≥ t"): per threshold — rows at or
    * above, positives at or above, precision, recall. The
    * threshold-picking table behind every alerting/moderation cutoff
    * decision; AUC ([[aucByKey]]) summarizes, this chooses.
    *
    * Same machinery and contracts as [[gainsTable]]: distinct-score
    * lattice (quantized-score scale contract — [[quantizeScores]] is
    * the enforcement path for continuous scores), DESC cumulative
    * counts, precision/recall as single divisions of exact BIGINTs.
    *
    * Output: (threshold, n_ge, pos_ge, precision, recall). */
  def prCurve(df: DataFrame, scoreCol: String, isPositive: Column): DataFrame = {
    val perScore = df.filter(col(scoreCol).isNotNull && isPositive.isNotNull)
      .groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("__n"),
        sum(when(isPositive, 1L).otherwise(0L)).as("__p"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perScore.agg(sum(col("__p")).cast("long").as("__totp"))
    perScore
      .withColumn("n_ge", sum(col("__n")).over(w).cast("long"))
      .withColumn("pos_ge", sum(col("__p")).over(w).cast("long"))
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("n_ge"), col("pos_ge"),
        (col("pos_ge").cast("double") / col("n_ge").cast("double"))
          .as("precision"),
        when(col("__totp") > 0,
          col("pos_ge").cast("double") / col("__totp").cast("double"))
          .as("recall"))
  }

  /** Ranking-eval rollup over a PRE-TRUNCATED top-k table (one row per
    * (query, candidate) with its 1-based rank): hit rate (any relevant
    * candidate in the list) and MRR in the repo's fixed-point
    * convention — `mrr_micro = 1e6 div best_relevant_rank` per query
    * (0 when nothing relevant), so the sum is an exact BIGINT at any
    * parallelism and the mean is ONE final division (a float Σ1/r
    * would be partition-order-dependent). Queries with no candidate
    * rows at all are absent by construction — the denominator is
    * "queries that produced a ranking", the retrieval-eval convention.
    *
    * Output: one row (n_queries, n_hit, sum_mrr_micro, hit_rate,
    * mean_mrr_micro). */
  def rankingReport(ranked: DataFrame, queryCol: String, rankCol: String,
                    isRelevant: Column): DataFrame =
    ranked.groupBy(col(queryCol).as("__q"))
      .agg(min(when(isRelevant, col(rankCol).cast("long"))).as("__best"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("__best").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_hit"),
        sum(coalesce(expr("1000000L div __best"), lit(0L)))
          .cast("long").as("sum_mrr_micro"))
      .withColumn("hit_rate",
        col("n_hit").cast("double") / col("n_queries").cast("double"))
      .withColumn("mean_mrr_micro",
        col("sum_mrr_micro").cast("double") / col("n_queries").cast("double"))

  /** Cohen's kappa — chance-corrected agreement between two
    * categorical columns (annotator vs annotator, prediction vs
    * label): `κ = (p_o − p_e)/(1 − p_e)` computed entirely in exact
    * integers as `(N·Σdiag − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k)`
    * — counts, margins, and the chance numerator never touch floats;
    * κ is the ONE final division. Degenerate tables (p_e = 1: a single
    * label on both sides) yield NULL, not a 0/0.
    *
    * Shape: one (a, b) cell aggregate (labels² rows — metadata), two
    * margin rollups, a labels-scale full-outer margin join. NULL in
    * either column drops the row (no agreement evidence).
    *
    * Output: one row (n, n_agree, chance_num BIGINT, kappa). The
    * margin cross products ride decimal(38,0) internally; the emitted
    * chance_num is BIGINT (≤ n², exact while n ≤ ~3e9 — no DecimalType
    * reaches compared output per the NOTES.md determinism rule). */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val base = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
    val cells = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val rm = cells.groupBy(col("__a").as("__k")).agg(sum(col("__c")).as("__ra"))
    val cm = cells.groupBy(col("__b").as("__k")).agg(sum(col("__c")).as("__cb"))
    val rc = rm.join(cm, Seq("__k"), "full_outer")
      .agg(coalesce(sum(coalesce(col("__ra"), lit(0L)).cast("decimal(38,0)")
          * coalesce(col("__cb"), lit(0L))), lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").cast("long").as("chance_num"))
    val tot = cells.agg(sum(col("__c")).cast("long").as("n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
        .cast("long").as("n_agree"))
    tot.crossJoin(broadcast(rc))
      .withColumn("kappa",
        when(col("n").cast("decimal(38,0)") * col("n") =!= col("chance_num"),
          (col("n").cast("double") * col("n_agree").cast("double")
            - col("chance_num").cast("double"))
            / (col("n").cast("double") * col("n").cast("double")
              - col("chance_num").cast("double"))))
  }

  /** Decile gains/lift table: rows ranked by score DESCENDING and cut
    * into `nBins` population bins; per bin — volume, positives, the
    * cumulative capture rate ("top 20% of scores catch X% of
    * positives") and cumulative lift vs the base rate. The targeting
    * readout behind every campaign-sizing decision.
    *
    * Determinism under ties: a distinct score's WHOLE tie group lands
    * in the bin of its first row (`bin = cum_before·nBins div total`),
    * so no arbitrary within-tie split exists — bins can be uneven by
    * at most one tie group, and the table is bit-identical on every
    * engine. Computation runs on the distinct-score frame (per-key
    * hash aggregate → values-scale windows → nBins-scale rollup);
    * rates are single divisions of exact BIGINTs.
    *
    * Scale note: the one ordered window here runs over the DISTINCT
    * SCORE frame. Model scores are bounded-grid values in practice
    * (float probabilities quantize to ≤1e6 distinct values at a 1e-6
    * grid — metadata-scale); for a genuinely continuous unbounded
    * score, pre-quantize with [[quantizeScores]] (the gains table is
    * decile-granular anyway) or range-bucket-decompose as
    * [[Profile.percentileNormalize]] does.
    * Output: (bin, n, n_pos, cum_n, cum_pos, capture_rate,
    * cum_lift). */
  def gainsTable(df: DataFrame, scoreCol: String, isPositive: Column,
                 nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val perScore = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(isPositive, 1L).otherwise(0L)).as("__p"))
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perScore.agg(sum(col("__n")).cast("long").as("__tot"),
      sum(col("__p")).cast("long").as("__totp"))
    val binned = perScore
      .withColumn("__cum", sum(col("__n")).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("bin",
        expr(s"((__cum - __n) * $nBins) div __tot").cast("int"))
      .groupBy(col("bin"))
      .agg(sum(col("__n")).cast("long").as("n"),
        sum(col("__p")).cast("long").as("n_pos"),
        max(col("__tot")).as("__tot"), max(col("__totp")).as("__totp"))
    val wB = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("cum_n", sum(col("n")).over(wB).cast("long"))
      .withColumn("cum_pos", sum(col("n_pos")).over(wB).cast("long"))
      .withColumn("capture_rate",
        when(col("__totp") > 0,
          col("cum_pos").cast("double") / col("__totp").cast("double")))
      .withColumn("cum_lift",
        when(col("__totp") > 0 && col("cum_n") > 0,
          (col("cum_pos").cast("double") / col("cum_n").cast("double"))
            / (col("__totp").cast("double") / col("__tot").cast("double"))))
      .drop("__tot", "__totp")
  }

  /** WEIGHTED Cohen's kappa over two INTEGER ordinal rating columns —
    * the ordinal completion of [[cohenKappa]]'s
    * family (unweighted kappa scores any off-diagonal disagreement
    * equally; here a near-miss costs `|i−j|^p` — Cohen 1968). Emitted
    * in the disagreement form, which is denominator-free and exactly
    * integral:
    *
    *   `κ_w = 1 − N·Σ|i−j|^p·n_ij / Σ|i−j|^p·r_i·c_j`
    *
    * (the weight-matrix normalization `1 − (|i−j|/(k−1))^p` cancels —
    * numerator and denominator scale by the same `(k−1)^p`). `w_obs`
    * and `w_exp` are exact BIGINTs (cells from ONE hash aggregate; the
    * expectation from the level-scale margin cross join, both sides
    * broadcast); κ is one double division over exact integers. Emits
    * one row per power p ∈ {1 (linear), 2 (quadratic)}: (power, n,
    * w_obs, w_exp, kappa) — NULL κ when `w_exp` = 0 (all mass on one
    * level pair). NULL ratings drop pairwise. */
  def weightedKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("long").as("__a"),
        col(bCol).cast("long").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // consumed by w_obs and both margins
    val n = cells.agg(sum(col("__n")).cast("long").as("n"))
    val ra = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__r"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__n")).as("__c"))
    def row(p: Int): DataFrame = {
      def w(i: Column, j: Column): Column = {
        val d = abs(i - j).cast(d38)
        if (p == 1) d else (d * d).cast(d38)
      }
      val wobs = cells
        .agg(sum(w(col("__a"), col("__b")) * col("__n")).cast(d38)
          .cast("long").as("w_obs"))
      val wexp = ra.crossJoin(broadcast(cb))
        .agg(sum(w(col("__a"), col("__b"))
          * (col("__r").cast(d38) * col("__c")).cast(d38)).cast(d38)
          .cast("long").as("w_exp"))
      n.crossJoin(broadcast(wobs)).crossJoin(broadcast(wexp))
        .select(lit(p.toLong).as("power"), col("n"), col("w_obs"),
          col("w_exp"),
          when(col("w_exp") > 0L,
            lit(1.0) - (col("n").cast(d38) * col("w_obs")).cast(d38)
              .cast("double") / col("w_exp").cast("double"))
            .as("kappa"))
    }
    row(1).unionAll(row(2))
  }
}
