package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact rank/order statistics — the distribution-comparison and
  * concentration tests an analytics engine needs beyond moment-based
  * drift (TV distance, chi-square, CUSUM already live in
  * `graft.checks.Drift` / `Timeseries`): two-sample Kolmogorov–Smirnov,
  * Mann–Whitney U, the Gini coefficient, and Spearman rank correlation.
  *
  * Two design rules shared by every operator here:
  *
  *  1. **Distinct-value decomposition.** Ranks are never assigned per
  *     ROW: every statistic is an exact function of the per-key
  *     (value, count) aggregate — cumulative counts give midranks
  *     (`2·C_prev + t + 1`, doubled to stay integer under average-rank
  *     ties), so the only windows run over per-key DISTINCT-VALUE
  *     frames (values-scale, partitioned by key), never over the raw
  *     fact stream. At 100 TB the plan is: one hash aggregate with
  *     map-side combine, then windows/joins on frames that are orders
  *     of magnitude smaller. No global or raw-row window anywhere.
  *  2. **Integer/decimal exactness.** Counts and doubled ranks are
  *     integers; cross products ride decimal(38,0) (a cum-count ×
  *     sample-size product overflows BIGINT near 1e10 rows per side);
  *     the statistic itself is ONE final IEEE division (or a
  *     division over sqrt, which is correctly rounded) — the q119 /
  *     autocorrelation discipline, engine-exact at any parallelism.
  *     Decimal stays INTERNAL: every emitted integer column is BIGINT
  *     (no DecimalType may reach oracle-compared output — NOTES.md).
  *     The BIGINT casts are exact while per-key sample sizes stay
  *     under ~3e9 rows (numerators are ≤ nA·nB / n·Σx-scale); beyond
  *     that they NULL loudly rather than wrap.
  */
object RankStats {

  /** Per-(key, value) counts split by membership in sample A:
    * (key, __v, __ca, __cb) — the shared reduction. Rows where the
    * membership predicate is NULL are EXCLUDED (they belong to neither
    * sample — silently counting them as B would bias every test). */
  private[operators] def splitCounts(df: DataFrame, keyCol: String,
                                     valueCol: String, isA: Column): DataFrame =
    df.filter(col(valueCol).isNotNull && isA.isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))

  /** Two-sample Kolmogorov–Smirnov statistic per key:
    * `D = max_v |F_A(v) − F_B(v)|`, evaluated in EXACT integer
    * arithmetic as `d_numerator = max |cumA·nB − cumB·nA|` over the
    * per-key distinct values, with `d_statistic = d_numerator/(nA·nB)`
    * as the one final division. The CDF-shaped companion to the
    * mix-based TV distance: sensitive to location/shape shifts a
    * category mix can't see.
    *
    * Output: (key, n_a, n_b, d_numerator BIGINT, d_statistic).
    * Keys where either sample is empty are dropped (D undefined). */
  def ksTwoSample(df: DataFrame, keyCol: String, valueCol: String,
                  isA: Column): DataFrame = {
    val counts = splitCounts(df, keyCol, valueCol, isA)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = counts.groupBy(col(keyCol))
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .join(Broadcasts.maybeBroadcast(totals), Seq(keyCol))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__gap",
        abs(col("__cuma").cast("decimal(38,0)") * col("n_b")
          - col("__cumb").cast("decimal(38,0)") * col("n_a"))
          .cast("decimal(38,0)"))
      .groupBy(col(keyCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("__gap")).cast("decimal(38,0)").cast("long").as("d_numerator"))
      .withColumn("d_statistic",
        col("d_numerator").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
  }

  /** Mann–Whitney U per key with exact average-rank tie handling, kept
    * integer by DOUBLING: a tie group of size `t` whose first combined
    * position is `C_prev + 1` has doubled midrank `2·C_prev + t + 1`,
    * so `2·R_A = Σ cA·(2·C_prev + t + 1)` is exact BIGINT-style
    * arithmetic (ridden in decimal(38,0) for the count×rank products)
    * and `2·U_A = 2·R_A − nA·(nA+1)`. The identity
    * `u_a_doubled + u_b_doubled = 2·nA·nB` holds exactly.
    *
    * Output: (key, n_a, n_b, u_a_doubled, u_b_doubled) — the caller
    * normalizes (U/2, or the z-approximation) if a scalar is wanted;
    * the exact integers are the oracle-comparable core. */
  def mannWhitneyU(df: DataFrame, keyCol: String, valueCol: String,
                   isA: Column): DataFrame = {
    val counts = splitCounts(df, keyCol, valueCol, isA)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__t", col("__ca") + col("__cb"))
      .withColumn("__cum", sum(col("__t")).over(w))
      // doubled midrank of this tie group: 2*(cum - t) + t + 1
      .withColumn("__rd",
        (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
          .cast("decimal(38,0)"))
      .groupBy(col(keyCol))
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(col("__ca").cast("decimal(38,0)") * col("__rd"))
          .cast("decimal(38,0)").as("__ra_d"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__ua_d",
        (col("__ra_d") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1))
          .cast("decimal(38,0)"))
      .withColumn("u_a_doubled", col("__ua_d").cast("long"))
      .withColumn("u_b_doubled",
        (lit(2L).cast("decimal(38,0)") * col("n_a") * col("n_b")
          - col("__ua_d")).cast("decimal(38,0)").cast("long"))
      .drop("__ra_d", "__ua_d")
  }

  /** Gini concentration coefficient per key over a NON-NEGATIVE value
    * on the 2-dp grid (amounts): `G = (2·Σ i·x_(i) − (n+1)·Σx)/(n·Σx)`
    * with `i` the 1-based position in the sorted order. Equal values
    * make Σ i·x invariant to tie order, so the statistic is total-order
    * deterministic without a tiebreak.
    *
    * Exactness: values convert to integer MICRO units via their exact
    * decimal grid (the CUSUM discipline); the tie-group identity
    * `Σ_{i∈group} i = t·(2·C_prev + t + 1)/2` turns the sorted-position
    * sum into a distinct-value aggregate — `2·Σ i·x = Σ_v xμ_v·t·rd_v`
    * — all decimal(38,0); `gini` is the one final double division.
    *
    * Output: (key, n, total_micro BIGINT, gini). Keys with a zero total
    * get NULL gini (concentration of nothing is undefined).
    *
    * Contract enforcement (negative / out-of-grid inputs): a NEGATIVE
    * value violates the stated contract — rather than silently
    * producing a meaningless statistic, the WHOLE key is NULLed out
    * loudly (the key's row survives when it has ≥1 valid row, `n`
    * counting valid rows, with `total_micro` and `gini` NULL — the
    * mortonCode out-of-range-goes-NULL discipline; a key with NO valid
    * rows drops entirely). A magnitude OVERFLOWING the decimal(12,2)
    * grid throws under Spark's default ANSI cast — the loudest
    * failure, never a spurious NULL distinct group. */
  def giniByKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val micro = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol),
        when(col(valueCol) >= 0,
          (col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__mu"))
      .withColumn("__mu", col("__mu") * 10000L) // 2-dp grid -> micro
    // per-key contract violations: ONLY negatives take the NULL path
    // (the `when` above leaves them NULL); a decimal-grid overflow
    // THROWS under ANSI before any NULL could reach this counter —
    // see the scaladoc contract. Key-cardinality frame, one extra agg
    val bad = micro.groupBy(col(keyCol))
      .agg(sum(when(col("__mu").isNull, 1L).otherwise(0L)).as("__nbad"))
    val counts = micro.filter(col("__mu").isNotNull)
      .groupBy(col(keyCol), col("__mu").as("__v"))
      .agg(count(lit(1)).as("__t"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cum", sum(col("__t")).over(w))
      .withColumn("__rd",
        (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
          .cast("decimal(38,0)"))
      .groupBy(col(keyCol))
      .agg(sum(col("__t")).as("n"),
        sum(col("__v").cast("decimal(38,0)") * col("__t"))
          .cast("decimal(38,0)").as("__tm"),
        sum(col("__v").cast("decimal(38,0)") * col("__t") * col("__rd"))
          .cast("decimal(38,0)").as("__two_ix"))
      .join(Broadcasts.maybeBroadcast(bad), Seq(keyCol), "left")
      .withColumn("__ok", coalesce(col("__nbad"), lit(0L)) === 0L)
      .withColumn("total_micro",
        when(col("__ok"), col("__tm").cast("long")))
      .withColumn("gini",
        when(col("__ok") && col("__tm") > 0,
          (col("__two_ix").cast("double")
            - (col("n") + 1).cast("double") * col("__tm").cast("double"))
            / (col("n").cast("double") * col("__tm").cast("double"))))
      .drop("__two_ix", "__tm", "__nbad", "__ok")
  }

  /** Kruskal–Wallis H test inputs per (key, group) — the k-sample
    * extension of [[mannWhitneyU]] (does ANY of k groups stochastically
    * dominate?): pooled doubled midranks over the per-key DISTINCT-
    * VALUE lattice, rolled to per-group doubled rank sums. Following
    * the [[Robust.sampleRatioMismatch]] convention the output is the
    * EXACT PER-GROUP PARTS, order-free and engine-portable — the
    * caller sums the handful of group terms for
    * `H = 12/(n(n+1)) · Σ_j (R_j²/n_j) − 3(n+1)` over `R_j =
    * r_sum_doubled/2`, divided by the tie correction
    * `1 − tie_cubed_sum/(n³−n)` (a float Σ_j over groups inside the
    * engine would be partition-order-dependent; k is variant-scale, so
    * driver-side finishing is free).
    *
    * Output per (key, group): n_j, r_sum_doubled, n, tie_cubed_sum
    * (Σ_v t³−t over the key's tie groups) — all BIGINT (decimal
    * internals; exact while per-key n ≤ ~2e6 for the t³ term at
    * worst-case single-value keys, ~3e9 otherwise — past that the ANSI
    * cast fails loudly). Rows where value or group is NULL are
    * excluded. */
  def kruskalWallis(df: DataFrame, keyCol: String, groupCol: String,
                    valueCol: String): DataFrame = {
    val cells = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(keyCol), col(groupCol).as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pooled = cells.groupBy(col(keyCol), col("__v"))
      .agg(sum(col("__c")).as("__t"))
      .withColumn("__cum", sum(col("__t")).over(w))
      .select(col(keyCol), col("__v"),
        (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
          .cast("decimal(38,0)").as("__rd"),
        col("__t"))
    val perKey = pooled.groupBy(col(keyCol))
      .agg(sum(col("__t")).as("n"),
        sum(col("__t").cast("decimal(38,0)") * col("__t") * col("__t")
          - col("__t")).cast("decimal(38,0)").cast("long")
          .as("tie_cubed_sum"))
    cells
      .join(pooled.select(col(keyCol), col("__v"), col("__rd")),
        Seq(keyCol, "__v"))
      .groupBy(col(keyCol), col("__g").as(groupCol))
      .agg(sum(col("__c")).as("n_j"),
        sum(col("__c").cast("decimal(38,0)") * col("__rd"))
          .cast("decimal(38,0)").cast("long").as("r_sum_doubled"))
      .join(Broadcasts.maybeBroadcast(perKey), Seq(keyCol))
  }

  /** Conover–Iman post-hoc pairwise parts — "WHICH groups differ",
    * the follow-up [[kruskalWallis]] licenses (Conover & Iman 1979:
    * pairwise t-tests on the pooled midranks, variance corrected by
    * the KW statistic). Parts-emission convention: every rank moment
    * is an exact integer off the doubled-midrank lattice —
    * per pair (n_a, n_b, r_sum_doubled each, and the cleared mean-rank
    * difference numerator `rsumd_a·n_b − rsumd_b·n_a`, whose true
    * denominator is `2·n_a·n_b`), per key (n, `sum_r2_quadrupled` =
    * Σ t·rd² = 4·ΣR², tie_cubed_sum) — the caller assembles
    * S² = (sum_r2_quadrupled − n(n+1)²)/(4(n−1)), H, and the t
    * statistic with its libm sqrt OUTSIDE the oracle-hashed frame
    * (the psiParts/theilsUParts discipline; summing H's per-group
    * rational terms in-engine would be partition-order-dependent).
    * Same single lattice pass as kruskalWallis plus a group-pair
    * self-join at (groups²)-scale. Emission bound: sum_r2_quadrupled
    * ≈ 4n³/3 exceeds BIGINT past n ≈ 1.9e6 rows per key — the moment
    * rides decimal internally and the final cast THROWS under ANSI
    * (loud, never silent) for larger keys; pre-aggregate or sample
    * upstream for population-scale keys. */
  def conoverParts(df: DataFrame, keyCol: String, groupCol: String,
                   valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(keyCol), col(groupCol).as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pooled = cells.groupBy(col(keyCol), col("__v"))
      .agg(sum(col("__c")).as("__t"))
      .withColumn("__cum", sum(col("__t")).over(w))
      .select(col(keyCol), col("__v"),
        (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
          .cast(d38).as("__rd"),
        col("__t"))
    val perKey = pooled.groupBy(col(keyCol))
      .agg(sum(col("__t")).as("n"),
        sum(col("__t").cast(d38) * col("__rd") * col("__rd"))
          .cast(d38).cast("long").as("sum_r2_quadrupled"),
        sum(col("__t").cast(d38) * col("__t") * col("__t")
          - col("__t")).cast(d38).cast("long").as("tie_cubed_sum"))
    val byGroup = cells
      .join(pooled.select(col(keyCol), col("__v"), col("__rd")),
        Seq(keyCol, "__v"))
      .groupBy(col(keyCol), col("__g"))
      .agg(sum(col("__c")).as("__nj"),
        sum(col("__c").cast(d38) * col("__rd"))
          .cast(d38).cast("long").as("__rsd"))
    val a = byGroup.select(col(keyCol), col("__g").as("g_a"),
      col("__nj").as("n_a"), col("__rsd").as("rsumd_a"))
    val b = byGroup.select(col(keyCol), col("__g").as("g_b"),
      col("__nj").as("n_b"), col("__rsd").as("rsumd_b"))
    a.join(b, Seq(keyCol)).filter(col("g_a") < col("g_b"))
      .withColumn("diff_doubled_num",
        (col("rsumd_a").cast(d38) * col("n_b")
          - col("rsumd_b").cast(d38) * col("n_a")).cast(d38).cast("long"))
      .join(Broadcasts.maybeBroadcast(perKey), Seq(keyCol))
  }

  /** Pettitt change-point parts per key — the RANK analog of
    * [[graft.operators.Timeseries.cusumParts]] (Pettitt 1979: the
    * Mann-Whitney statistic between every prefix and its suffix,
    * maximized over the split): robust to outliers and any monotone
    * transform where the CUSUM of values is not. On the doubled-
    * midrank lattice the statistic is exactly
    * `U_t = cumrd_t − t·(n+1)` (cumrd = 2·Σ midranks of the first t
    * rows — the doubling cancels the classical 2·R_t), so every
    * emitted column is an exact BIGINT: n, max |U_t|, and the FIRST x
    * attaining it (the change-point estimate; significance scaling
    * caller-side). Same cell contract as the sibling (one row per
    * (key, x), duplicate raise); one lattice pass + one window. */
  def pettittParts(df: DataFrame, keyCol: String, xCol: String,
                   valueCol: String): DataFrame = {
    val cells = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"),
        max((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
          .as("__v"))
      .withColumn("__v",
        when(col("__cx") > 1, raise_error(lit(
          "pettittParts: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__v")))
      .drop("__cx")
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pooled = cells.groupBy(col(keyCol), col("__v"))
      .agg(count(lit(1)).as("__t"))
      .withColumn("__cum", sum(col("__t")).over(wv))
      .select(col(keyCol), col("__v"),
        (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
          .as("__rd"))
    val tot = cells.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val wx = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = cells
      .join(pooled, Seq(keyCol, "__v"))
      .join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__pos", count(lit(1)).over(wx))
      .withColumn("__u",
        sum(col("__rd")).over(wx) - col("__pos") * (col("__n") + 1L))
    val mx = scored.groupBy(col(keyCol))
      .agg(max(abs(col("__u"))).cast("long").as("max_abs_u"))
    scored.join(Broadcasts.maybeBroadcast(mx), Seq(keyCol))
      .filter(abs(col("__u")) === col("max_abs_u"))
      .groupBy(col(keyCol))
      .agg(min(col("__x")).as("argmax_x"),
        max(col("max_abs_u")).as("max_abs_u"),
        max(col("__n")).cast("long").as("n"))
  }

  /** Kendall's τ-b per key with exact tie handling: concordant /
    * discordant pair counts from a self-join of the per-key DISTINCT
    * (x, y) CELL frame (never raw rows — the bounded-grid contract of
    * the quantile partials: cells-scale², fine for the gridded/
    * categorical values this test is for; a genuinely continuous pair
    * should be pre-quantized, [[graft.operators.Eval.quantizeScores]]).
    * `τ_b = (C−D)/(√(n0−n1)·√(n0−n2))` with `n0 = n(n−1)/2`, `n1/n2`
    * the x/y tie-pair counts — cross products ride decimal, emitted
    * BIGINT, τ_b is division-over-sqrt (correctly rounded, portable).
    *
    * Output: (key, n, concordant, discordant, tie_pairs_x, tie_pairs_y,
    * tau_b). Keys fully tied on either axis yield NULL τ_b. */
  def kendallTau(df: DataFrame, keyCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // consumed 4x below — never replay lineage
    val a = cells.select(col(keyCol), col("__x").as("__xa"),
      col("__y").as("__ya"), col("__c").as("__ca"))
    val b = cells.select(col(keyCol), col("__x").as("__xb"),
      col("__y").as("__yb"), col("__c").as("__cb"))
    val pairAgg = a.join(b, Seq(keyCol))
      .filter(col("__xa") < col("__xb"))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("__ya") < col("__yb"),
          col("__ca").cast("decimal(38,0)") * col("__cb")))
          .cast("decimal(38,0)").cast("long").as("concordant"),
        sum(when(col("__ya") > col("__yb"),
          col("__ca").cast("decimal(38,0)") * col("__cb")))
          .cast("decimal(38,0)").cast("long").as("discordant"))
    def tiePairs(vCol: String, out: String) = cells
      .groupBy(col(keyCol), col(vCol)).agg(sum(col("__c")).as("__t"))
      .groupBy(col(keyCol))
      .agg((sum(col("__t").cast("decimal(38,0)") * (col("__t") - 1)) / 2)
        .cast("decimal(38,0)").cast("long").as(out))
    val totals = cells.groupBy(col(keyCol)).agg(sum(col("__c")).as("n"))
    totals
      .join(pairAgg, Seq(keyCol), "left")
      .join(tiePairs("__x", "tie_pairs_x"), Seq(keyCol))
      .join(tiePairs("__y", "tie_pairs_y"), Seq(keyCol))
      .withColumn("concordant", coalesce(col("concordant"), lit(0L)))
      .withColumn("discordant", coalesce(col("discordant"), lit(0L)))
      .withColumn("__n0",
        (col("n").cast("decimal(38,0)") * (col("n") - 1) / 2)
          .cast("decimal(38,0)").cast("long"))
      .withColumn("tau_b", {
        val dx = (col("__n0") - col("tie_pairs_x")).cast("double")
        val dy = (col("__n0") - col("tie_pairs_y")).cast("double")
        when(dx > 0.0 && dy > 0.0,
          (col("concordant") - col("discordant")).cast("double")
            / (sqrt(dx) * sqrt(dy)))
      })
      .select(col(keyCol), col("n"), col("concordant"), col("discordant"),
        col("tie_pairs_x"), col("tie_pairs_y"), col("tau_b"))
  }

  /** Two-sample Cramér–von Mises test per key — the INTEGRATED
    * EDF-distance sibling of the KS test (KS reads the single worst
    * gap between the two empirical CDFs; CvM integrates the squared
    * gap over the whole pooled sample, so spread-out moderate
    * differences that never spike past KS's maximum still register):
    * Anderson's rank form `U = n·Σ_i (r_i − i)² + m·Σ_j (s_j − j)²`
    * with r/s the pooled ranks and i/j the within-sample positions,
    * computed on DOUBLED midranks (`U·4 = n·Σ(rd−id)² + m·Σ(sd−jd)²`
    * — ties take midranks on both the pooled and own axes, every term
    * an exact BIGINT-in-decimal), then
    * `T = U4/(4·n·m·(n+m)) − (4nm−1)/(6(n+m))` as one fixed double
    * chain. All cumulatives run over per-key distinct-VALUE lattices
    * (the doubled-midrank house pattern — never a row rank).
    *
    * Output per key: (key, n_a, n_b, u4, t_stat) — NULL T when either
    * side is empty. */
  def cramerVonMises(df: DataFrame, keyCol: String, valueCol: String,
                     isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cells
      .withColumn("__cum", sum(col("__t")).over(w))
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      // pooled and own-sample doubled midranks at this value
      .withColumn("__rd",
        lit(2L) * (col("__cum") - col("__t")) + col("__t") + 1L)
      .withColumn("__ida",
        lit(2L) * (col("__cuma") - col("__ca")) + col("__ca") + 1L)
      .withColumn("__idb",
        lit(2L) * (col("__cumb") - col("__cb")) + col("__cb") + 1L)
    val parts = ranked.groupBy(col(keyCol))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"),
        sum(col("__ca").cast(d38) * (col("__rd") - col("__ida"))
          * (col("__rd") - col("__ida"))).cast(d38).as("__ua"),
        sum(col("__cb").cast(d38) * (col("__rd") - col("__idb"))
          * (col("__rd") - col("__idb"))).cast(d38).as("__ub"))
    parts
      .withColumn("u4",
        (col("n_a").cast(d38) * col("__ua")
          + col("n_b").cast(d38) * col("__ub")).cast(d38).cast("long"))
      .withColumn("t_stat", {
        val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
        when(col("n_a") > 0 && col("n_b") > 0,
          col("u4").cast("double") / (lit(4.0) * na * nb * (na + nb)) -
            (lit(4.0) * na * nb - 1.0) / (lit(6.0) * (na + nb)))
      })
      .select(col(keyCol), col("n_a"), col("n_b"), col("u4"),
        col("t_stat"))
  }

  /** Two-sample Anderson–Darling test per key — the TAIL-WEIGHTED
    * member of the EDF family (KS reads the worst gap, [[cramerVonMises]]
    * integrates it uniformly; AD divides by B(N−B), so distribution
    * differences in the TAILS — exactly where corpus quality filters
    * bite — weigh most): the Scholz–Stephens tie-aware form
    * `A² = (1/N)·Σ_i (1/n_i)·Σ_j t_j·(N·M_ij − n_i·B_j)²/(B_j(N−B_j))`
    * over distinct pooled values j (the B_j = N endpoint drops — its
    * weight is a removable 0/0), with each variable-denominator term
    * FLOORED by exact integer division on the unit grid (the
    * [[graft.operators.Robust.cramersV]] flooring discipline — the
    * numerators are exact decimals, each floor loses < 1 against term
    * sums ~10¹²⁺). One lattice cumulative per key; A² is one fixed
    * double chain from the two exact per-sample sums.
    *
    * Output per key: (key, n_a, n_b, sum_a_floor, sum_b_floor,
    * a2_stat) — NULL A² when either side is empty. */
  def andersonDarling2(df: DataFrame, keyCol: String, valueCol: String,
                       isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy(col(keyCol))
      .agg(sum(col("__ca")).cast("long").as("__na"),
        sum(col("__cb")).cast("long").as("__nb"))
      .withColumn("__nn", col("__na") + col("__nb"))
    val ranked = cells
      .withColumn("__bj", sum(col("__t")).over(w))
      .withColumn("__ma", sum(col("__ca")).over(w))
      .withColumn("__mb", sum(col("__cb")).over(w))
      .join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .filter(col("__bj") < col("__nn")) // the B = N endpoint drops
      .withColumn("__da",
        (col("__nn").cast(d38) * col("__ma")
          - col("__na").cast(d38) * col("__bj")).cast(d38))
      .withColumn("__db",
        (col("__nn").cast(d38) * col("__mb")
          - col("__nb").cast(d38) * col("__bj")).cast(d38))
    val sums = ranked.groupBy(col(keyCol))
      .agg(
        sum(expr("(__t * (__da * __da)) div (__bj * (__nn - __bj))"))
          .cast("long").as("__sa"),
        sum(expr("(__t * (__db * __db)) div (__bj * (__nn - __bj))"))
          .cast("long").as("__sb"))
    // a key whose only value IS the B = N endpoint (fully tied
    // identical samples) has no interior terms — that's A² = 0, not a
    // dropped key
    tot.join(sums, Seq(keyCol), "left")
      .withColumn("sum_a_floor", coalesce(col("__sa"), lit(0L)))
      .withColumn("sum_b_floor", coalesce(col("__sb"), lit(0L)))
      .withColumn("a2_stat",
        when(col("__na") > 0 && col("__nb") > 0,
          (col("sum_a_floor").cast("double") / col("__na").cast("double") +
            col("sum_b_floor").cast("double") / col("__nb").cast("double"))
            / col("__nn").cast("double")))
      .select(col(keyCol), col("__na").as("n_a"), col("__nb").as("n_b"),
        col("sum_a_floor"), col("sum_b_floor"), col("a2_stat"))
  }

  /** Ansari–Bradley scale test per key — "same center, different
    * SPREAD?" (the rank test for dispersion: scores fold in from both
    * ends, `a = min(rank, N+1−rank)`, so a sample hugging the middle
    * scores high and one spilling into both tails scores low — the
    * distribution-free sibling of [[graft.operators.Robust
    * .brownForsythe]]): doubled scores `s2 = min(rd, 2(N+1) − rd)`
    * from the pooled doubled midranks keep every part an exact
    * BIGINT, and the null moments come from the FINITE-POPULATION
    * identity (under H0 sample A is a uniform n_a-subset of the
    * pooled score multiset — ties need no special correction because
    * the moments read the ACTUAL scores): `E[W2] = n_a·Σs2/N`,
    * `Var[W2] = n_a·n_b·(N·Σs2² − (Σs2)²)/(N²(N−1))`; z is one fixed
    * double chain (all inputs BIGINT→double, correctly rounded in
    * every engine — unlike HUGEINT/decimal casts).
    *
    * Output per key: (key, n_a, n_b, w2, s2_sum, ss2_sum, z) — z NULL
    * when either side is empty or the variance vanishes. */
  def ansariBradley(df: DataFrame, keyCol: String, valueCol: String,
                    isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy(col(keyCol))
      .agg(sum(col("__t")).cast("long").as("__nn"))
    val scored = cells
      .withColumn("__cum", sum(col("__t")).over(w))
      .withColumn("__rd",
        lit(2L) * (col("__cum") - col("__t")) + col("__t") + 1L)
      .join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__s2",
        least(col("__rd"), lit(2L) * (col("__nn") + 1) - col("__rd")))
    scored.groupBy(col(keyCol))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"),
        sum(col("__ca").cast(d38) * col("__s2")).cast(d38).cast("long")
          .as("w2"),
        sum(col("__t").cast(d38) * col("__s2")).cast(d38).cast("long")
          .as("s2_sum"),
        sum(col("__t").cast(d38) * col("__s2") * col("__s2")).cast(d38)
          .cast("long").as("ss2_sum"),
        max(col("__nn")).as("__nn"))
      .withColumn("z", {
        val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
        val nn = col("__nn").cast("double")
        val e = na * col("s2_sum").cast("double") / nn
        val vr = na * nb *
          (nn * col("ss2_sum").cast("double") -
            col("s2_sum").cast("double") * col("s2_sum").cast("double")) /
          (nn * nn * (nn - 1.0))
        when(col("n_a") > 0 && col("n_b") > 0 && vr > 0.0,
          (col("w2").cast("double") - e) / sqrt(vr))
      })
      .select(col(keyCol), col("n_a"), col("n_b"), col("w2"),
        col("s2_sum"), col("ss2_sum"), col("z"))
  }

  /** Conover squared-ranks scale test per key — [[ansariBradley]]'s
    * higher-power sibling (AB folds ranks in from both ends; Conover
    * SQUARES the centered ranks, so far-tail mass weighs
    * quadratically — the usual pick when the spread difference is
    * tail-heavy): quadrupled scores `s4 = (rd − (N+1))²` from the
    * pooled doubled midranks (untied: (2r − (N+1))² = 4·(r −
    * (N+1)/2)²), null moments from the same FINITE-POPULATION
    * identity over the actual score multiset (tie-exact):
    * `E[W4] = n_a·Σs4/N`,
    * `Var[W4] = n_a·n_b·(N·Σs4² − (Σs4)²)/(N²(N−1))`. Σs4² rides
    * decimal (≈N⁵ — BIGINT dies near 10⁴ rows) and is emitted as a
    * DOUBLE via the correctly-rounded decimal cast (mirrors:
    * VARCHAR-route it — the hoeffdingD trap); everything else is an
    * exact BIGINT.
    *
    * Output per key: (key, n_a, n_b, w4, s4_sum, ss4_sum_d, z). */
  def conoverSquaredRanks(df: DataFrame, keyCol: String, valueCol: String,
                          isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy(col(keyCol))
      .agg(sum(col("__t")).cast("long").as("__nn"))
    val scored = cells
      .withColumn("__cum", sum(col("__t")).over(w))
      .withColumn("__rd",
        lit(2L) * (col("__cum") - col("__t")) + col("__t") + 1L)
      .join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("__s4",
        (col("__rd") - (col("__nn") + 1)) * (col("__rd") - (col("__nn") + 1)))
    scored.groupBy(col(keyCol))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"),
        sum(col("__ca").cast(d38) * col("__s4")).cast(d38).cast("long")
          .as("w4"),
        sum(col("__t").cast(d38) * col("__s4")).cast(d38).cast("long")
          .as("s4_sum"),
        sum(col("__t").cast(d38) * col("__s4") * col("__s4")).cast(d38)
          .as("__ss4"),
        max(col("__nn")).as("__nn"))
      .withColumn("ss4_sum_d", col("__ss4").cast("double"))
      .withColumn("z", {
        val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
        val nn = col("__nn").cast("double")
        val e = na * col("s4_sum").cast("double") / nn
        val vr = na * nb *
          (nn * col("ss4_sum_d") -
            col("s4_sum").cast("double") * col("s4_sum").cast("double")) /
          (nn * nn * (nn - 1.0))
        when(col("n_a") > 0 && col("n_b") > 0 && vr > 0.0,
          (col("w4").cast("double") - e) / sqrt(vr))
      })
      .select(col(keyCol), col("n_a"), col("n_b"), col("w4"),
        col("s4_sum"), col("ss4_sum_d"), col("z"))
  }

  /** Savage (exponential-scores) two-sample test per key — the
    * EXTREME-value member of the rank-score triple ([[ansariBradley]]
    * location-free spread, [[conoverSquaredRanks]] tail-quadratic
    * spread, Savage for exponential-ish right tails: the locally most
    * powerful rank test under proportional hazards / Lehmann
    * alternatives). The harmonic Savage scores
    * `a(r) = Σ_{j≤r} 1/(N+1−j) − 1` are IRRATIONAL partial sums — not
    * representable in the exact-BIGINT score discipline the AB/Conover
    * finite-population identity rides — so the engine emits the test
    * through the CLASSICAL IDENTITY instead: with no censoring the
    * Savage test IS the log-rank test (Savage's statistic and the
    * log-rank O−E agree up to sign/scale; Hájek & Šidák §III.4),
    * whose per-distinct-value parts ARE exact integers. Ties follow
    * the hypergeometric (log-rank) convention — the standard
    * generalization.
    *
    * Parts per (key, value), the keyed sibling of
    * [[graft.operators.Survival.logRankParts]]'s fold-it-yourself
    * convention (a float Σ inside the engine would be
    * partition-order-dependent): `d_a, d_b` = per-group counts at the
    * value, `n_risk_a/b` = at-risk (value ≥ v) counts,
    * `e_num = d·n_risk_a` / `e_den = r` (exact BIGINTs; ≤ N², safe),
    * `expected_a` their one division, and `variance` the
    * hypergeometric `d(r−d)·r_a·r_b / (r²(r−1))` as ONE FIXED double
    * chain `((d·(r−d))·(r_a·r_b)) / (((r·r)·(r−1)))` — each
    * multiplication correctly rounded, tree mirrored verbatim by the
    * oracle (the raw v_num integer would exceed BIGINT near N≈55k —
    * the r8 squared-residual lesson — so it is never emitted).
    * Caller folds `z = Σ(d_a − expected_a) / sqrt(Σ variance)`.
    *
    * Output per (key, value): (key, value, n_risk_a, n_risk_b, d_a,
    * d_b, e_num, e_den, expected_a, variance) — variance NULL when
    * r ≤ 1. */
  def savageParts(df: DataFrame, keyCol: String, valueCol: String,
                  isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("value"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("d_a"),
        sum(when(isA, 0L).otherwise(1L)).as("d_b"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("value").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy(col(keyCol))
      .agg(sum(col("d_a")).cast("long").as("__na"),
        sum(col("d_b")).cast("long").as("__nb"))
    cells
      .withColumn("__cuma", sum(col("d_a")).over(w))
      .withColumn("__cumb", sum(col("d_b")).over(w))
      .join(Broadcasts.maybeBroadcast(tot), Seq(keyCol))
      .withColumn("n_risk_a",
        (col("__na") - (col("__cuma") - col("d_a"))).cast("long"))
      .withColumn("n_risk_b",
        (col("__nb") - (col("__cumb") - col("d_b"))).cast("long"))
      .withColumn("__d", (col("d_a") + col("d_b")).cast("long"))
      .withColumn("e_den",
        (col("n_risk_a") + col("n_risk_b")).cast("long"))
      .withColumn("e_num",
        (col("__d").cast(d38) * col("n_risk_a")).cast(d38).cast("long"))
      .withColumn("expected_a",
        col("e_num").cast("double") / col("e_den").cast("double"))
      .withColumn("variance",
        when(col("e_den") > 1,
          (col("__d").cast("double")
            * (col("e_den") - col("__d")).cast("double"))
            * (col("n_risk_a").cast("double")
              * col("n_risk_b").cast("double"))
            / ((col("e_den").cast("double") * col("e_den").cast("double"))
              * (col("e_den") - 1).cast("double"))))
      .select(col(keyCol), col("value"), col("n_risk_a"),
        col("n_risk_b"), col("d_a").cast("long").as("d_a"),
        col("d_b").cast("long").as("d_b"), col("e_num"), col("e_den"),
        col("expected_a"), col("variance"))
  }

  /** Fligner–Killeen scale test in PARTS-EMISSION form — the
    * median-centered rank test for dispersion (the robust default
    * `fligner.test` in R: center each group by ITS OWN median, rank
    * the pooled |centered| values, score with normal quantiles). The
    * scores need `Φ⁻¹` — libm, cross-engine-divergent — so the engine
    * emits the exact integer lattice and the scoring fold is
    * CALLER-side (the [[graft.operators.Robust.bartlettParts]] /
    * psiParts convention):
    *
    *   per (group, distinct |c − med_g| cents value): `cnt` (group
    *   count at that centered value), `rd` = POOLED doubled midrank
    *   (`2·cum_before + t + 1` over the ascending a-lattice — ties
    *   exact by construction), and `n_total`.
    *
    * Caller scores `s = Φ⁻¹((1 + r̄/(N+1))/2)` with `r̄ = rd/2`, then
    * folds the k-sample statistic
    * `X² = Σ_g n_g(s̄_g − s̄)²/V` with `V = Σ(s − s̄)²/(N−1)` — every
    * input to those sums is one of the emitted exact parts. Group
    * medians use the house lattice selection rule
    * `min(v : 2·cum ≥ n_g)` ([[graft.operators.Robust.brownForsythe]]);
    * the a-lattice cumulative is the one global window (values-scale,
    * the documented exception). Output: distinct-(group, a)-scale. */
  def flignerParts(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        (col(valueCol).cast("decimal(12,2)") * 100).cast("long").as("__c"))
    val wg = Window.partitionBy(col("grp")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = base.groupBy(col("grp"), col("__c").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(wg))
      .join(Broadcasts.maybeBroadcast(
        base.groupBy(col("grp")).agg(count(lit(1)).as("__ng"))),
        Seq("grp"))
      .filter(col("__cum") * 2 >= col("__ng"))
      .groupBy(col("grp")).agg(min(col("__v")).as("__med"))
    val av = base.join(Broadcasts.maybeBroadcast(med), Seq("grp"))
      .select(col("grp"), abs(col("__c") - col("__med")).as("a_cents"))
    val cells = av.groupBy(col("grp"), col("a_cents"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val lat = cells.groupBy(col("a_cents"))
      .agg(sum(col("cnt")).cast("long").as("__t"))
    val wa = Window.orderBy(col("a_cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = lat
      .withColumn("__cum", sum(col("__t")).over(wa))
      .withColumn("rd",
        (lit(2L) * (col("__cum") - col("__t")) + col("__t") + 1L)
          .cast("long"))
      .select(col("a_cents"), col("rd"))
    val tot = av.agg(count(lit(1)).cast("long").as("n_total"))
    cells.join(Broadcasts.maybeBroadcast(ranked), Seq("a_cents"))
      .crossJoin(broadcast(tot))
      .select(col("grp"), col("a_cents"), col("cnt"), col("rd"),
        col("n_total"))
  }

  /** k-sample Anderson–Darling PARTS per key — [[andersonDarling2]]
    * generalized to any group count (Scholz–Stephens' actual setting:
    * "did ANY of the k sources drift?" in one test instead of k²/2
    * pairwise ones): the same tie-aware floored terms
    * `Σ_j t_j·(N·M_ij − n_i·B_j)²/(B_j(N−B_j))` accumulate per GROUP
    * over the zero-filled (pooled value × group) lattice, and each
    * group row carries its own one-division contribution
    * `a2_contrib = sum_floor/(n_i·N)` — the statistic
    * `A²kN = Σ_i a2_contrib` folds over the k-row output (the
    * [[graft.operators.Survival.logRankParts]] SRM order-free
    * convention: a float Σ inside the engine would be partition-
    * order-dependent; k rows are the caller's to fold). At k = 2 the
    * two sums equal [[andersonDarling2]]'s exactly (spec-pinned).
    *
    * Output per (key, group): (key, group, n_i, sum_floor,
    * a2_contrib). */
  def andersonDarlingK(df: DataFrame, keyCol: String, groupCol: String,
                       valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(keyCol), col(groupCol).cast("string").as("__g"),
        col(valueCol).as("__v"))
    val cells = base.groupBy(col(keyCol), col("__v"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // feeds pooled, groups, and the lattice
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pooled = cells.groupBy(col(keyCol), col("__v"))
      .agg(sum(col("__c")).as("__t"))
      .withColumn("__bj", sum(col("__t")).over(w))
    val groups = cells.groupBy(col(keyCol), col("__g"))
      .agg(sum(col("__c")).cast("long").as("__ni"))
    val totals = groups.groupBy(col(keyCol))
      .agg(sum(col("__ni")).cast("long").as("__nn"))
    val wm = Window.partitionBy(col(keyCol), col("__g"))
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lattice = pooled.join(groups, Seq(keyCol)) // values × groups
      .join(cells, Seq(keyCol, "__v", "__g"), "left")
      .withColumn("__c0", coalesce(col("__c"), lit(0L)))
      .withColumn("__m", sum(col("__c0")).over(wm))
      .join(Broadcasts.maybeBroadcast(totals), Seq(keyCol))
      .filter(col("__bj") < col("__nn"))
      .withColumn("__d",
        (col("__nn").cast(d38) * col("__m")
          - col("__ni").cast(d38) * col("__bj")).cast(d38))
    val sums = lattice.groupBy(col(keyCol), col("__g"))
      .agg(max(col("__ni")).as("__ni2"), max(col("__nn")).as("__nn2"),
        sum(expr("(__t * (__d * __d)) div (__bj * (__nn - __bj))"))
          .cast("long").as("__sf"))
    // degenerate keys (single pooled value = the endpoint) keep their
    // group rows with zero sums — the andersonDarling2 rule
    groups.join(Broadcasts.maybeBroadcast(totals), Seq(keyCol))
      .join(sums.select(col(keyCol), col("__g"), col("__sf")),
        Seq(keyCol, "__g"), "left")
      .withColumn("sum_floor", coalesce(col("__sf"), lit(0L)))
      .withColumn("a2_contrib",
        when(col("__ni") > 0 && col("__nn") > 0,
          col("sum_floor").cast("double")
            / (col("__ni").cast("double") * col("__nn").cast("double"))))
      .select(col(keyCol), col("__g").as("group"),
        col("__ni").as("n_i"), col("sum_floor"), col("a2_contrib"))
  }

  /** Energy distance per key — the two-sample test that reads ACTUAL
    * distances, not just ranks (Székely's e-statistic: `E = 2·E|X−Y|
    * − E|X−X'| − E|Y−Y'|` ≥ 0, = 0 iff the distributions match — so
    * unlike rank tests it also prices HOW FAR apart the masses sit,
    * in the column's own units): every pairwise-|difference| sum
    * clears to exact integers via the sorted-prefix identity
    * `Σ_{j<i} c_j·(v_i − v_j) = v_i·ΣC_prev − ΣS_prev` on the cent
    * grid — three running (count, sum) pairs on ONE per-key value-
    * lattice window, never an all-pairs join. Sums count each
    * unordered pair once and ride decimal (cast BIGINT out — safe to
    * ~10¹⁸ cent-pair mass, loud past it).
    *
    * Output per key: (key, n_a, n_b, sab_cents, saa_cents, sbb_cents,
    * e_stat_cents) — e_stat in CENTS (the value column's 2-dp grid
    * ×100); NULL when either side is empty. */
  def energyDistance(df: DataFrame, keyCol: String, valueCol: String,
                     isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol),
        (col(valueCol).cast("decimal(12,2)") * 100).cast("long").as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("__cna", sum(col("__ca")).over(w) - col("__ca"))
      .withColumn("__cnb", sum(col("__cb")).over(w) - col("__cb"))
      .withColumn("__csa",
        sum(col("__ca").cast(d38) * col("__v")).over(w)
          - col("__ca").cast(d38) * col("__v"))
      .withColumn("__csb",
        sum(col("__cb").cast(d38) * col("__v")).over(w)
          - col("__cb").cast(d38) * col("__v"))
    cum.groupBy(col(keyCol))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"),
        // cross pairs: this cell's a-mass against all LOWER b-mass,
        // plus this cell's b-mass against all lower a-mass
        sum(col("__ca").cast(d38)
          * (col("__v").cast(d38) * col("__cnb") - col("__csb"))
          + col("__cb").cast(d38)
          * (col("__v").cast(d38) * col("__cna") - col("__csa")))
          .cast(d38).cast("long").as("sab_cents"),
        sum(col("__ca").cast(d38)
          * (col("__v").cast(d38) * col("__cna") - col("__csa")))
          .cast(d38).cast("long").as("saa_cents"),
        sum(col("__cb").cast(d38)
          * (col("__v").cast(d38) * col("__cnb") - col("__csb")))
          .cast(d38).cast("long").as("sbb_cents"))
      .withColumn("e_stat_cents", {
        val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
        when(col("n_a") > 0 && col("n_b") > 0,
          lit(2.0) * col("sab_cents").cast("double") / (na * nb) -
            lit(2.0) * col("saa_cents").cast("double") / (na * na) -
            lit(2.0) * col("sbb_cents").cast("double") / (nb * nb))
      })
      .select(col(keyCol), col("n_a"), col("n_b"), col("sab_cents"),
        col("saa_cents"), col("sbb_cents"), col("e_stat_cents"))
  }

  /** Dunn's post-hoc test — the pairwise follow-up [[kruskalWallis]]
    * points at ("KW says SOME group differs; Dunn says WHICH pairs"):
    * for each group pair, `z = (R̄_i − R̄_j) / √(σ²·(1/n_i + 1/n_j))`
    * with `σ² = (n(n+1) − T/(n−1))/12`, T = Σ(t³−t) the tie
    * correction — DERIVED from kruskalWallis' exact per-group parts
    * (r_sum_doubled, n_j, tie_cubed_sum; the cohensD no-drift
    * convention), so mean ranks are `r_sum_doubled/(2n_j)` and z is
    * one fixed double chain per pair. The pair fan-out is k²-scale
    * metadata (groups, not rows). Pairs ordered group_a < group_b
    * (string order) — each pair once.
    *
    * Output per (key, group_a, group_b): (key, group_a, group_b, n_a,
    * n_b, z) — z NULL when σ² ≤ 0 (degenerate all-tied key). */
  def dunnTest(df: DataFrame, keyCol: String, groupCol: String,
               valueCol: String): DataFrame = {
    val kw = kruskalWallis(df, keyCol, groupCol, valueCol)
      .localCheckpoint(true) // consumed twice (pair self-join)
    val a = kw.select(col(keyCol), col(groupCol).cast("string").as("group_a"),
      col("n_j").as("__na"), col("r_sum_doubled").as("__ra"),
      col("n").as("__n"), col("tie_cubed_sum").as("__t"))
    val b = kw.select(col(keyCol), col(groupCol).cast("string").as("group_b"),
      col("n_j").as("__nb"), col("r_sum_doubled").as("__rb"))
    a.join(b, Seq(keyCol)).filter(col("group_a") < col("group_b"))
      .withColumn("__var",
        (col("__n").cast("double") * (col("__n").cast("double") + 1.0)
          - col("__t").cast("double") / (col("__n").cast("double") - 1.0))
          / 12.0)
      .withColumn("z", {
        // binary operators at END of line — a leading `/` silently (or
        // here loudly) ends the previous statement
        val meanA = col("__ra").cast("double") /
          (lit(2.0) * col("__na").cast("double"))
        val meanB = col("__rb").cast("double") /
          (lit(2.0) * col("__nb").cast("double"))
        val se = sqrt(col("__var") * (lit(1.0) / col("__na").cast("double")
          + lit(1.0) / col("__nb").cast("double")))
        when(col("__var") > 0.0, (meanA - meanB) / se)
      })
      .select(col(keyCol), col("group_a"), col("group_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"), col("z"))
  }

  /** Quade test — [[friedmanParts]] weighted by block INFORMATIVENESS
    * (Friedman treats every block equally; Quade weights blocks by the
    * rank of their value RANGE, so blocks where treatments actually
    * separate count more — the standard k-treatment blocked test when
    * effect sizes vary by block): with within-block doubled value
    * midranks r2, across-block doubled range-ranks q2 (range = max−min
    * cents, exact), the quadrupled scores `S4 = q2·(r2 − (k+1))`
    * accumulate exactly, and with `A·16 = Σ S4²`,
    * `Sj·4 = Σ_blocks S4` per treatment:
    * `F = (n−1)·Σ_j Sj4² / (n·A16 − Σ_j Sj4²)` — the 16s cancel, one
    * division of exact decimal-held integers (VARCHAR-route the big
    * casts in mirrors — the hoeffdingD trap). Complete-design contract
    * as friedman (ragged raises); F NULL when the denominator is 0
    * (all blocks internally constant).
    *
    * Output per treatment: (treatment, n_blocks, k_treatments, s4_sum,
    * f_stat) — f_stat identical on every row. */
  def quadeParts(df: DataFrame, blockCol: String, treatmentCol: String,
                 valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(blockCol).isNotNull
      && col(treatmentCol).isNotNull && col(valueCol).isNotNull)
      .select(col(blockCol).as("__b"),
        col(treatmentCol).cast("string").as("__t"),
        (col(valueCol).cast("decimal(12,2)") * 100).cast("long").as("__v"))
    // within-block doubled midranks (the friedman chain)
    val cells = base.groupBy(col("__b"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(col("__b")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cells
      .withColumn("__cum", sum(col("__c")).over(wv))
      .select(col("__b"), col("__v"),
        (lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1L)
          .as("__r2"))
    // across-block doubled midranks of block ranges
    val ranges = base.groupBy(col("__b"))
      .agg((max(col("__v")) - min(col("__v"))).as("__range"),
        count(lit(1)).as("__rows"),
        count_distinct(col("__t")).as("__kt"))
    val wr = Window.orderBy(col("__range").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rcells = ranges.groupBy(col("__range"))
      .agg(count(lit(1)).as("__rc"))
      .withColumn("__rcum", sum(col("__rc")).over(wr))
      .select(col("__range"),
        (lit(2L) * (col("__rcum") - col("__rc")) + col("__rc") + 1L)
          .as("__q2"))
    val gk = base.agg(count_distinct(col("__t")).as("__kg"))
    val shape = ranges
      .agg(count(lit(1)).cast("long").as("__nb"),
        min(col("__rows")).as("__rmin"), max(col("__rows")).as("__rmax"),
        min(col("__kt")).as("__kmin"), max(col("__kt")).as("__kmax"))
      .crossJoin(broadcast(gk))
      .withColumn("__k",
        when(col("__rmin") =!= col("__rmax")
          || col("__kmin") =!= col("__kmax")
          || col("__rmin") =!= col("__kmin")
          || col("__kmax") =!= col("__kg"), raise_error(lit(
          "quadeParts: ragged design — every block must contain every" +
            " treatment exactly once; zero-fill upstream")))
          .otherwise(col("__kmax")).cast("long"))
      .select(col("__nb"), col("__k"))
    val scored = base
      .join(ranked, Seq("__b", "__v"))
      .join(ranges.select(col("__b"), col("__range")), Seq("__b"))
      .join(Broadcasts.maybeBroadcast(rcells), Seq("__range"))
      .crossJoin(broadcast(shape))
      .withColumn("__s4",
        (col("__q2").cast(d38) * (col("__r2") - (col("__k") + 1)))
          .cast(d38))
    val a16 = scored.agg(
      sum(col("__s4") * col("__s4")).cast(d38).as("__a16"))
    val perTreat = scored.groupBy(col("__t"))
      .agg(max(col("__nb")).as("n_blocks"), max(col("__k"))
        .as("k_treatments"),
        sum(col("__s4")).cast(d38).as("__sj4"))
    val bsum = perTreat.agg(
      sum(col("__sj4") * col("__sj4")).cast(d38).as("__b16"))
    perTreat.crossJoin(broadcast(a16)).crossJoin(broadcast(bsum))
      .withColumn("__den",
        (col("n_blocks").cast(d38) * col("__a16") - col("__b16"))
          .cast(d38))
      .withColumn("f_stat",
        when(col("__den") > 0,
          ((col("n_blocks") - 1).cast(d38) * col("__b16")).cast(d38)
            .cast("double") / col("__den").cast("double")))
      .select(col("__t").as("treatment"), col("n_blocks"),
        col("k_treatments"), col("__sj4").cast("long").as("s4_sum"),
        col("f_stat"))
  }

  /** Goodman–Kruskal γ and Somers' D — the two remaining classical
    * ordinal-association readouts, DERIVED from [[kendallTau]]'s exact
    * concordant/discordant/tie-pair integers (the
    * [[graft.operators.Robust.cohensD]] no-drift convention: this
    * calls kendallTau, so the four statistics can never disagree on
    * their shared parts). γ = (C−D)/(C+D) ignores ties entirely —
    * the "among untied pairs, how often does y agree with x"
    * association; Somers' D_yx = (C−D)/(n0−n1) penalizes y-ties but
    * not x-ties — the asymmetric form for "x predicts y" (the
    * ROC-AUC relative, AUC = (D_yx+1)/2 for a binary y). Each is one
    * division over the exact BIGINTs. Same bounded-grid contract as
    * kendallTau (pre-quantize continuous pairs).
    *
    * Output: kendallTau's columns + (gamma, somers_d_yx); both NULL
    * on degenerate keys (no untied pairs / all x tied). */
  def ordinalAssociation(df: DataFrame, keyCol: String, xCol: String,
                         yCol: String): DataFrame =
    kendallTau(df, keyCol, xCol, yCol)
      .withColumn("__n0",
        (col("n").cast("decimal(38,0)") * (col("n") - 1) / 2)
          .cast("decimal(38,0)").cast("long"))
      .withColumn("gamma",
        when(col("concordant") + col("discordant") > 0,
          (col("concordant") - col("discordant")).cast("double")
            / (col("concordant") + col("discordant")).cast("double")))
      .withColumn("somers_d_yx",
        when(col("__n0") - col("tie_pairs_x") > 0,
          (col("concordant") - col("discordant")).cast("double")
            / (col("__n0") - col("tie_pairs_x")).cast("double")))
      .drop("__n0")

  /** Page's trend test — [[friedmanParts]]' ORDERED-alternative
    * sibling (Friedman asks "do the treatments differ at all?"; Page
    * asks "do they increase in a hypothesized order?" — the blocked
    * analogue of [[jonckheereTerpstra]]): `L = Σ_j w_j·R_j` with
    * weights w_j = 1..k in ascending TREATMENT order (the caller
    * encodes the hypothesized order in the treatment key — zero-pad
    * or prefix to sort). Derived from friedmanParts' exact doubled
    * rank sums: `l2 = Σ j·R2_j = 2L` is an exact BIGINT (the j-rank
    * window runs over the k-row parts frame — metadata scale), the
    * null mean `E[2L] = n·k·(k+1)²/2` is exact (k(k+1)² is always
    * even), and z uses the no-tie variance `Var[L] =
    * n·k²·(k+1)·(k²−1)/144` — the documented mildly-conservative
    * convention under ties, same as friedman's χ². Complete-design
    * contract inherited (ragged raises).
    *
    * Output: one row (n_blocks, k_treatments, l2, z); z NULL when
    * k < 3 (no order to trend over). */
  def pageTrend(df: DataFrame, blockCol: String, treatmentCol: String,
                valueCol: String): DataFrame = {
    val w = Window.orderBy(col("treatment").asc)
    friedmanParts(df, blockCol, treatmentCol, valueCol)
      .withColumn("__j", row_number().over(w).cast("long"))
      .groupBy(col("n_blocks"), col("k_treatments"))
      .agg(sum(col("__j").cast("decimal(38,0)") * col("r2_sum"))
        .cast("decimal(38,0)").cast("long").as("l2"))
      .withColumn("__e2",
        expr("(n_blocks * k_treatments * (k_treatments + 1)" +
          " * (k_treatments + 1)) div 2"))
      .withColumn("__var",
        col("n_blocks").cast("double")
          * col("k_treatments").cast("double")
          * col("k_treatments").cast("double")
          * (col("k_treatments").cast("double") + 1.0)
          * (col("k_treatments").cast("double")
            * col("k_treatments").cast("double") - 1.0) / 144.0)
      .withColumn("z",
        when(col("k_treatments") >= 3 && col("__var") > 0.0,
          (col("l2") - col("__e2")).cast("double")
            / (lit(2.0) * sqrt(col("__var")))))
      .select(col("n_blocks"), col("k_treatments"), col("l2"), col("z"))
  }

  /** Cochran's Q — [[friedmanParts]] for BINARY outcomes ("did the
    * k checkers/models/treatments flag the same blocks?"): with
    * column totals C_j (per-treatment successes), row totals R_i
    * (per-block successes), and N = ΣC_j, the whole statistic clears
    * to one division of exact BIGINTs:
    * `Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)`.
    * Complete-design contract (every block contains every treatment
    * exactly once, globally identical treatment sets — the
    * [[friedmanParts]] guard); non-0/1 success values raise in-plan.
    * BIGINT bound: k·ΣC_j² ≤ k²·n_blocks² — exact past 10⁸ blocks at
    * k ≤ 20 (ANSI throws loudly beyond).
    *
    * Output: one row (n_blocks, k_treatments, n_success, q_num,
    * q_den, q_stat) — q_stat NULL when q_den = 0 (all blocks all-0
    * or all-1: no within-block information). */
  def cochranQ(df: DataFrame, blockCol: String, treatmentCol: String,
               successCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(blockCol).isNotNull
      && col(treatmentCol).isNotNull && col(successCol).isNotNull)
      .select(col(blockCol).as("__b"),
        col(treatmentCol).cast("string").as("__t"),
        when(col(successCol).cast("long").isin(0L, 1L),
          col(successCol).cast("long"))
          .otherwise(raise_error(lit(
            "cochranQ: success must be boolean / 0-1"))).as("__s"))
    val gk = base.agg(count_distinct(col("__t")).as("__kg"))
    val shape = base.groupBy(col("__b"))
      .agg(count(lit(1)).as("__rows"),
        count_distinct(col("__t")).as("__kt"),
        sum(col("__s")).as("__r"))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        min(col("__rows")).as("__rmin"), max(col("__rows")).as("__rmax"),
        min(col("__kt")).as("__kmin"), max(col("__kt")).as("__kmax"),
        sum(col("__r").cast(d38) * col("__r")).cast(d38).cast("long")
          .as("__sr2"))
      .crossJoin(broadcast(gk))
      .withColumn("k_treatments",
        when(col("__rmin") =!= col("__rmax")
          || col("__kmin") =!= col("__kmax")
          || col("__rmin") =!= col("__kmin")
          || col("__kmax") =!= col("__kg"), raise_error(lit(
          "cochranQ: ragged design — every block must contain every" +
            " treatment exactly once; zero-fill upstream")))
          .otherwise(col("__kmax")).cast("long"))
      .select(col("n_blocks"), col("k_treatments"), col("__sr2"))
    val colTotals = base.groupBy(col("__t"))
      .agg(sum(col("__s")).cast("long").as("__cj"))
      .agg(sum(col("__cj")).cast("long").as("n_success"),
        sum(col("__cj").cast(d38) * col("__cj")).cast(d38).cast("long")
          .as("__sc2"))
    colTotals.crossJoin(broadcast(shape))
      .withColumn("q_num",
        ((col("k_treatments") - 1).cast(d38)
          * (col("k_treatments").cast(d38) * col("__sc2")
            - col("n_success").cast(d38) * col("n_success")))
          .cast(d38).cast("long"))
      .withColumn("q_den",
        (col("k_treatments").cast(d38) * col("n_success")
          - col("__sr2")).cast(d38).cast("long"))
      .withColumn("q_stat",
        when(col("q_den") > 0,
          col("q_num").cast("double") / col("q_den").cast("double")))
      .select(col("n_blocks"), col("k_treatments"), col("n_success"),
        col("q_num"), col("q_den"), col("q_stat"))
  }

  /** Hoeffding's D per key — the ordinal association test that sees
    * NON-MONOTONE dependence ([[kendallTau]] / [[ordinalAssociation]]
    * score a U-shape as ~0; D detects ANY departure from
    * independence): the classical statistic over midranks R, S and
    * bivariate ranks Q, with every part an exact integer on doubled /
    * quadrupled grids. Conventions (the SAS/Hollander-Wolfe form):
    * `R2 = 2·C_prev + t + 1` (house doubled midranks per axis),
    * `Q4 = 4·A + 2·Bx + 2·By + c + 3` where A is the strictly-below-
    * left cell mass and Bx/By the same-x/same-y strips below — ties
    * on one axis count ½, on both ¼. Then with
    * `D1·16 = Σ c·(Q4−4)(Q4−8)`,
    * `D2·16 = Σ c·(R2−2)(R2−4)(S2−2)(S2−4)`,
    * `D3·16 = Σ c·(R2−4)(S2−4)(Q4−4)`:
    * `D = 30·[(n−2)(n−3)·D1·16 + D2·16 − 2(n−2)·D3·16] /
    * (16·n(n−1)(n−2)(n−3)(n−4))` — the numerator rides decimal(38,0)
    * (D2·16 ≤ 16·n⁵ passes BIGINT near n ≈ 4000, far under the
    * decimal ceiling to n ≈ 10⁶·…; ANSI throws loudly past 38 digits)
    * and the one emitted statistic is a fixed IEEE chain from the
    * exact decimal (Spark's decimal→double is correctly rounded —
    * engine-portable like sqrt; NOTE for mirrors: DuckDB's direct
    * HUGEINT→DOUBLE cast is NOT — it landed 1 ulp off on this very
    * statistic — route through VARCHAR, whose strtod parse is
    * correctly rounded). D ∈ [−0.5, 1] with 1 = perfect dependence.
    *
    * Same bounded-grid contract as [[kendallTau]] (the A/Bx/By
    * dominance masses come from one cells² self-join per key —
    * pre-quantize continuous pairs); NULL D when n < 5.
    *
    * Output per key: (key, n, d1_16, d3_16, hoeffding_d) — d1/d3
    * emitted exact (BIGINT-safe to n ≈ 10⁶); the n⁵-scale d2 lives
    * only inside the decimal chain. */
  def hoeffdingD(df: DataFrame, keyCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // consumed 5x below — never replay lineage
    // dominance masses per target cell from the cells² self-join
    val a = cells.select(col(keyCol), col("__x").as("__xa"),
      col("__y").as("__ya"), col("__c").as("__ca"))
    val dom = a.join(cells, Seq(keyCol))
      .filter((col("__xa") < col("__x") && col("__ya") <= col("__y"))
        || (col("__xa") === col("__x") && col("__ya") < col("__y")))
      .groupBy(col(keyCol), col("__x"), col("__y"))
      .agg(
        sum(when(col("__xa") < col("__x") && col("__ya") < col("__y"),
          col("__ca"))).cast("long").as("__A"),
        sum(when(col("__xa") === col("__x") && col("__ya") < col("__y"),
          col("__ca"))).cast("long").as("__Bx"),
        sum(when(col("__xa") < col("__x") && col("__ya") === col("__y"),
          col("__ca"))).cast("long").as("__By"))
    // doubled midranks per axis from distinct-value cumulatives
    def axisRank(vCol: String, out: String) = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(vCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.groupBy(col(keyCol), col(vCol))
        .agg(sum(col("__c")).as("__t"))
        .withColumn("__cum", sum(col("__t")).over(w))
        .select(col(keyCol), col(vCol),
          (lit(2L) * (col("__cum") - col("__t")) + col("__t") + 1L)
            .as(out))
    }
    val n = cells.groupBy(col(keyCol))
      .agg(sum(col("__c")).cast("long").as("n"))
    val rows = cells
      .join(dom, Seq(keyCol, "__x", "__y"), "left")
      .join(axisRank("__x", "__r2"), Seq(keyCol, "__x"))
      .join(axisRank("__y", "__s2"), Seq(keyCol, "__y"))
      .withColumn("__q4",
        lit(4L) * coalesce(col("__A"), lit(0L))
          + lit(2L) * coalesce(col("__Bx"), lit(0L))
          + lit(2L) * coalesce(col("__By"), lit(0L))
          + col("__c") + lit(3L))
    val parts = rows.groupBy(col(keyCol))
      .agg(
        sum(col("__c").cast(d38) * (col("__q4") - 4) * (col("__q4") - 8))
          .cast(d38).as("__d1"),
        sum(col("__c").cast(d38) * (col("__r2") - 2) * (col("__r2") - 4)
          * (col("__s2") - 2) * (col("__s2") - 4)).cast(d38).as("__d2"),
        sum(col("__c").cast(d38) * (col("__r2") - 4) * (col("__s2") - 4)
          * (col("__q4") - 4)).cast(d38).as("__d3"))
    n.join(parts, Seq(keyCol))
      .withColumn("__num",
        ((col("n") - 2).cast(d38) * (col("n") - 3) * col("__d1")
          + col("__d2")
          - lit(2).cast(d38) * (col("n") - 2) * col("__d3")).cast(d38))
      .withColumn("hoeffding_d", {
        val nd = col("n").cast("double")
        when(col("n") >= 5,
          lit(30.0) * col("__num").cast("double")
            / (lit(16.0) * nd * (nd - 1.0) * (nd - 2.0) * (nd - 3.0)
              * (nd - 4.0)))
      })
      .select(col(keyCol), col("n"),
        col("__d1").cast("long").as("d1_16"),
        col("__d3").cast("long").as("d3_16"), col("hoeffding_d"))
  }

  /** Lorenz curve table per key — the inequality CURVE behind
    * [[giniByKey]]'s scalar ("the top 1% of documents hold 40% of the
    * token mass"): one row per distinct value with cumulative
    * population and mass counts, ascending by value. Exact integers on
    * the micro grid (same non-negative 2-dp contract as gini —
    * negative values raise in-plan, the loud-failure convention; grid
    * overflow throws via the ANSI cast); the two shares are single
    * divisions. Windows run over the per-key distinct-value frame
    * only.
    *
    * Output: (key, value_micro, n_at_value, cum_n, cum_micro, n,
    * total_micro, pop_share, mass_share). */
  def lorenzCurve(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val micro = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol),
        when(col(valueCol) < 0, raise_error(lit(
          s"lorenzCurve: negative $valueCol — the mass curve needs " +
            "non-negative values")))
          .otherwise((col(valueCol).cast("decimal(12,2)") * 100)
            .cast("long") * 10000L).as("__mu"))
    val counts = micro.groupBy(col(keyCol), col("__mu").as("value_micro"))
      .agg(count(lit(1)).as("n_at_value"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("value_micro").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = counts.groupBy(col(keyCol))
      .agg(sum(col("n_at_value")).as("n"),
        sum(col("value_micro").cast("decimal(38,0)") * col("n_at_value"))
          .cast("decimal(38,0)").cast("long").as("total_micro"))
    counts
      .withColumn("cum_n", sum(col("n_at_value")).over(w).cast("long"))
      .withColumn("cum_micro",
        sum(col("value_micro").cast("decimal(38,0)") * col("n_at_value"))
          .over(w).cast("decimal(38,0)").cast("long"))
      .join(Broadcasts.maybeBroadcast(totals), Seq(keyCol))
      .withColumn("pop_share",
        col("cum_n").cast("double") / col("n").cast("double"))
      .withColumn("mass_share",
        when(col("total_micro") > 0,
          col("cum_micro").cast("double") / col("total_micro").cast("double")))
  }

  /** Spearman rank correlation per key: Pearson over exact doubled
    * midranks of x and y (average-rank ties; the doubling cancels in
    * ρ). Midranks come from per-key distinct-value cumulative counts
    * joined back to the (x, y) pair aggregate — the raw stream is
    * touched by hash aggregates only. Moments ride decimal(38,0); ρ is
    * `(n·Σxy − Σx·Σy) / (√(n·Σxx−Σx²) · √(n·Σyy−Σy²))` in doubles
    * (sqrt is correctly rounded — engine-portable; keys with a
    * degenerate side yield NULL).
    *
    * Output: (key, n, rho). */
  def spearmanByKey(df: DataFrame, keyCol: String, xCol: String,
                    yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
    def midranks(vCol: String, out: String) = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col(keyCol), col(vCol).as("__v"))
        .agg(sum(col("__c")).as("__t"))
        .withColumn("__cum", sum(col("__t")).over(w))
        .select(col(keyCol), col("__v").as(vCol),
          (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
            .cast("decimal(38,0)").as(out))
    }
    val d38 = "decimal(38,0)"
    val m = base
      .join(midranks("__x", "__rx"), Seq(keyCol, "__x"))
      .join(midranks("__y", "__ry"), Seq(keyCol, "__y"))
      .groupBy(col(keyCol)).agg(
        sum(col("__c")).as("n"),
        sum(col("__c") * col("__rx")).cast(d38).as("__sx"),
        sum(col("__c") * col("__ry")).cast(d38).as("__sy"),
        sum(col("__c") * col("__rx") * col("__rx")).cast(d38).as("__sxx"),
        sum(col("__c") * col("__ry") * col("__ry")).cast(d38).as("__syy"),
        sum(col("__c") * col("__rx") * col("__ry")).cast(d38).as("__sxy"))
    val nD = col("n").cast("double")
    // one-line subtractions (leading-`-` continuation trap — NOTES.md)
    val num = (nD * col("__sxy").cast("double")) -
      (col("__sx").cast("double") * col("__sy").cast("double"))
    val dx = (nD * col("__sxx").cast("double")) -
      (col("__sx").cast("double") * col("__sx").cast("double"))
    val dy = (nD * col("__syy").cast("double")) -
      (col("__sy").cast("double") * col("__sy").cast("double"))
    m.select(col(keyCol), col("n"),
      when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy))).as("rho"))
  }

  /** Spearman's FOOTRULE per key — the L1 sibling of [[spearmanByKey]]
    * (|rank difference| sum instead of squared-rank correlation: less
    * sensitive to a single wild displacement, the classic
    * rank-stability readout for "did the leaderboard shuffle?"
    * monitoring). Doubled midranks keep ties exact, so the emitted
    * statistic `f2 = Σ c·|rdx − rdy|` is TWICE the classical footrule
    * `D = Σ|r_x − r_y|` — an exact BIGINT at any parallelism (no
    * division, no floats in-engine); the normalized
    * `1 − 3D/(n²−1)·…` variants are one caller-side chain from
    * (n, f2). Same distinct-value cumulative-count midrank machinery
    * as [[spearmanByKey]] — hash aggregates and values-scale windows
    * only.
    *
    * Output: (key, n, f2). */
  def footrule(df: DataFrame, keyCol: String, xCol: String,
               yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
    def midranks(vCol: String, out: String) = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col(keyCol), col(vCol).as("__v"))
        .agg(sum(col("__c")).as("__t"))
        .withColumn("__cum", sum(col("__t")).over(w))
        .select(col(keyCol), col("__v").as(vCol),
          (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
            .cast("long").as(out))
    }
    base
      .join(midranks("__x", "__rx"), Seq(keyCol, "__x"))
      .join(midranks("__y", "__ry"), Seq(keyCol, "__y"))
      .groupBy(col(keyCol)).agg(
        sum(col("__c")).cast("long").as("n"),
        sum(col("__c").cast("decimal(38,0)")
          * abs(col("__rx") - col("__ry"))).cast("decimal(38,0)")
          .cast("long").as("f2"))
      .select(col(keyCol), col("n"), col("f2"))
  }

  /** Brunner–Munzel PARTS per key — the modern replacement for
    * [[mannWhitneyU]] when the two samples may differ in SHAPE as
    * well as location (BM does not assume equal variances of the
    * placement distributions; the recommended default two-sample test
    * in much of the methodological literature). The statistic runs on
    * PLACEMENTS `P_i = R_i − R_i^(g)` (pooled rank minus within-group
    * rank); on doubled midranks every placement is an exact integer,
    * so the engine emits the exact parts and the caller runs the two
    * fixed chains:
    *
    *   `p̂ = (rdb_sum/(2·n_b) − (n_b+1)/2)/n_a` (the stochastic
    *   superiority estimate; equivalently from the A side),
    *   `S²_g` from `(dg_sum, dg2_sum)` — the within-group placement
    *   sums and squared sums (`d2 = rd − rd_g`, so
    *   `S²_g = (dg2_sum − dg_sum²/(2n_g)·…)/4` in the caller's
    *   un-doubling), then the BM t and Welch-like df.
    *
    * All sums ride decimal(38,0) and emit as BIGINT (d2² ≤ (2N)², so
    * the sum is ≤ 4N³ — inside BIGINT to N ≈ 10⁶; beyond that the
    * cast NULLs loudly). Same distinct-value lattice machinery as
    * [[ansariBradley]]: three cumulative midrank windows (pooled,
    * A-only, B-only), hash aggregates everywhere else.
    *
    * Output per key: (key, n_a, n_b, rda_sum, rdb_sum, da_sum,
    * da2_sum, db_sum, db2_sum). */
  def brunnerMunzelParts(df: DataFrame, keyCol: String, valueCol: String,
                         isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cells
      .withColumn("__cum", sum(col("__t")).over(w))
      .withColumn("rd",
        lit(2L) * (col("__cum") - col("__t")) + col("__t") + 1L)
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("rda",
        lit(2L) * (col("__cuma") - col("__ca")) + col("__ca") + 1L)
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("rdb",
        lit(2L) * (col("__cumb") - col("__cb")) + col("__cb") + 1L)
    ranked.groupBy(col(keyCol))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"),
        sum(col("__ca").cast(d38) * col("rd")).cast(d38).cast("long")
          .as("rda_sum"),
        sum(col("__cb").cast(d38) * col("rd")).cast(d38).cast("long")
          .as("rdb_sum"),
        sum(col("__ca").cast(d38) * (col("rd") - col("rda"))).cast(d38)
          .cast("long").as("da_sum"),
        sum(col("__ca").cast(d38) * (col("rd") - col("rda"))
          * (col("rd") - col("rda"))).cast(d38).cast("long")
          .as("da2_sum"),
        sum(col("__cb").cast(d38) * (col("rd") - col("rdb"))).cast(d38)
          .cast("long").as("db_sum"),
        sum(col("__cb").cast(d38) * (col("rd") - col("rdb"))
          * (col("rd") - col("rdb"))).cast(d38).cast("long")
          .as("db2_sum"))
  }

  /** Spearman rank-correlation MATRIX over k columns — the rank twin
    * of [[graft.operators.Profile.correlationMatrix]] (that one is
    * Pearson on raw values; this one is Pearson on exact doubled
    * midranks, so monotone-but-curved relations score |ρ| ≈ 1 and
    * outliers lose their leverage — the matrix a feature-screening
    * pass actually wants). Each column is midranked ONCE over its
    * global distinct-value lattice (k vocab-scale windows), the
    * ranked columns join back onto the row stream by value (k hash
    * equi-joins, never row-pairwise), and ALL k² pair moments
    * accumulate in ONE aggregate pass. Same ρ chain as
    * [[spearmanByKey]] (exact decimal moments, sqrt correctly
    * rounded). Output per unordered pair (col_a < col_b
    * lexicographically): (col_a, col_b, n, rho). Rows with a NULL in
    * ANY of the k columns are dropped (listwise deletion — the
    * correlationMatrix convention, so every pair sees the same n). */
  def spearmanMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val d38 = "decimal(38,0)"
    val base0 = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(col): _*)
    def ranked(c: String): DataFrame = {
      val w = Window.orderBy(col("__v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base0.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__t"))
        .withColumn("__cum", sum(col("__t")).over(w))
        .select(col("__v").as(c),
          (lit(2L) * (col("__cum") - col("__t")) + col("__t") + lit(1L))
            .cast("long").as(s"__r_$c"))
    }
    val withRanks = cols.foldLeft(base0) { (d, c) =>
      d.join(Broadcasts.maybeBroadcast(ranked(c)), Seq(c))
    }
    val aggs = count(lit(1)).cast("long").as("n") +:
      cols.flatMap { c => Seq(
        sum(col(s"__r_$c").cast(d38)).cast(d38).as(s"__s_$c"),
        sum((col(s"__r_$c") * col(s"__r_$c")).cast(d38)).cast(d38)
          .as(s"__ss_$c"))
      } ++: cols.combinations(2).toSeq.map { case Seq(a, b) =>
        sum((col(s"__r_$a") * col(s"__r_$b")).cast(d38)).cast(d38)
          .as(s"__sp_${a}__$b")
      }
    val m = withRanks.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.combinations(2).toSeq.map { case Seq(a0, b0) =>
      // rho is symmetric; the emitted pair label is lexicographic
      val (a, b) = if (a0 <= b0) (a0, b0) else (b0, a0)
      val nD = col("n").cast("double")
      val num = (nD * col(s"__sp_${a0}__$b0").cast("double")) -
        (col(s"__s_$a0").cast("double") * col(s"__s_$b0").cast("double"))
      val dx = (nD * col(s"__ss_$a0").cast("double")) -
        (col(s"__s_$a0").cast("double") * col(s"__s_$a0").cast("double"))
      val dy = (nD * col(s"__ss_$b0").cast("double")) -
        (col(s"__s_$b0").cast("double") * col(s"__s_$b0").cast("double"))
      m.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
        when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy)))
          .as("rho"))
    }
    pairs.reduce(_.unionAll(_))
  }

  /** Cochran–Mantel–Haenszel PARTS — stratified 2×2 association
    * ("does exposure associate with outcome CONTROLLING for the
    * stratum?" — the confounder-adjusted test a flat chi-square
    * cannot give; Simpson's-paradox-proof by construction). Per
    * stratum the hypergeometric parts are exact integers, the
    * [[graft.operators.Survival.logRankParts]] convention (CMH is
    * the log-rank machinery on strata instead of time points):
    *
    *   `a` = exposed-and-positive count, `r1` = exposed row total,
    *   `c1` = positive column total, `n` = stratum total,
    *   `e_num/e_den` = expectation `r1·c1 / n` cleared of division,
    *   `v_num/v_den` = variance `r1·r2·c1·c2 / (n²(n−1))` — and
    *   `CMH = (|Σ(a − E)| − ½)² / ΣV` folds caller-side over the
    *   stratum rows (a float Σ in-engine would be
    *   partition-order-dependent).
    *
    * One hash aggregate over the rows → stratum-count-scale output:
    * (stratum, a, r1, c1, n, e_num, e_den, expected, v_num, v_den,
    * variance). v_num ≤ n⁴ rides decimal and emits BIGINT — exact to
    * n ≈ 50k rows per stratum; beyond that the cast NULLs loudly
    * (the r8 bound discipline). */
  def cmhParts(df: DataFrame, stratumCol: String, isExposed: Column,
               isPositive: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.filter(col(stratumCol).isNotNull
        && isExposed.isNotNull && isPositive.isNotNull)
      .groupBy(col(stratumCol))
      .agg(
        sum(when(isExposed && isPositive, 1L).otherwise(0L)).cast("long")
          .as("a"),
        sum(when(isExposed, 1L).otherwise(0L)).cast("long").as("r1"),
        sum(when(isPositive, 1L).otherwise(0L)).cast("long").as("c1"),
        count(lit(1)).cast("long").as("n"))
      .withColumn("e_num",
        (col("r1").cast(d38) * col("c1")).cast(d38).cast("long"))
      .withColumn("e_den", col("n"))
      .withColumn("expected",
        col("e_num").cast("double") / col("e_den").cast("double"))
      .withColumn("v_num",
        (col("r1").cast(d38) * (col("n") - col("r1")) * col("c1")
          * (col("n") - col("c1"))).cast(d38).cast("long"))
      .withColumn("v_den",
        (col("n").cast(d38) * col("n") * (col("n") - 1)).cast(d38)
          .cast("long"))
      .withColumn("variance",
        when(col("n") > 1,
          col("v_num").cast("double") / col("v_den").cast("double")))
  }

  /** Mann–Kendall trend TEST per key — "is this series monotonically
    * trending?", the hypothesis-test companion of
    * [[graft.operators.Timeseries.theilSen]]'s trend ESTIMATE (same
    * input shape; run both — the slope says how much, this says
    * whether it's distinguishable from noise):
    * `S = Σ_{i<j} sign(y_j − y_i)` over the time-ordered series, with
    * the tie-corrected null variance
    * `Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18` and the
    * continuity-corrected `z = (S ∓ 1)/√Var(S)` (0 at S = 0). S and
    * the variance numerator are exact BIGINTs; z is one fixed double
    * chain.
    *
    * `(key, x)` must be UNIQUE (pre-aggregate to daily/period grain
    * upstream — the standard MK setting); a duplicate x raises
    * in-plan rather than silently double-counting pairs. Cost is the
    * C(n,2) per-key pair join — the [[kendallTau]] bounded-series
    * contract (daily/weekly aggregates, n in the tens-to-hundreds),
    * NOT raw event scale.
    *
    * Output per key: (key, n, s_stat, var_num, var_s = var_num/18,
    * z) — var/z NULL when n < 2 or Var(S) = 0. */
  def mannKendall(df: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol), col(xCol).as("__x"))
      .agg(count(lit(1)).as("__cx"), max(col(yCol)).as("__y"))
      .withColumn("__y",
        when(col("__cx") > 1, raise_error(lit(
          "mannKendall: duplicate x within a key — pre-aggregate to " +
            "one row per (key, x)"))).otherwise(col("__y")))
      .drop("__cx")
      .localCheckpoint(true) // consumed 3x (pairs both sides + ties)
    val a = cells.select(col(keyCol), col("__x").as("__xa"),
      col("__y").as("__ya"))
    val b = cells.select(col(keyCol), col("__x").as("__xb"),
      col("__y").as("__yb"))
    val s = a.join(b, Seq(keyCol))
      .filter(col("__xa") < col("__xb"))
      .groupBy(col(keyCol))
      .agg(sum(when(col("__yb") > col("__ya"), 1L)
        .when(col("__yb") < col("__ya"), -1L).otherwise(0L))
        .cast("long").as("s_stat"))
    val ties = cells.groupBy(col(keyCol), col("__y"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__nv"), sum(col("__t")).cast("long").as("n"),
        sum(col("__t") * (col("__t") - 1) * (lit(2L) * col("__t") + 5))
          .cast("long").as("__tie_sum"))
    ties.join(s, Seq(keyCol), "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L))) // n = 1
      .withColumn("var_num",
        (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
          - col("__tie_sum")).cast("long"))
      .withColumn("var_s",
        when(col("n") > 1, col("var_num").cast("double") / 18.0))
      .withColumn("z",
        when(col("var_s") > 0.0,
          when(col("s_stat") > 0,
            (col("s_stat").cast("double") - 1.0) / sqrt(col("var_s")))
            .when(col("s_stat") < 0,
              (col("s_stat").cast("double") + 1.0) / sqrt(col("var_s")))
            .otherwise(lit(0.0))))
      .select(col(keyCol), col("n"), col("s_stat"), col("var_num"),
        col("var_s"), col("z"))
  }

  /** Jonckheere–Terpstra ordered-alternative test per key — "does the
    * OUTCOME shift upward across ORDERED groups?" (the continuous-
    * outcome sibling of [[graft.operators.Robust.cochranArmitage]]'s
    * binary trend, and the ordered refinement of Kruskal–Wallis's
    * any-difference question): `J = Σ_{g<h} U_{gh}` over all ordered
    * group pairs, each U a Mann–Whitney count. DOUBLED convention
    * keeps ties integer: `J2 = Σ_{cells (g,v1)×(h,v2), g<h}
    * c1·c2·(2·[v1<v2] + [v1=v2])`, an exact BIGINT from the
    * distinct-CELL self-join — the [[kendallTau]] bounded-grid
    * contract (pre-quantize continuous outcomes with
    * [[graft.operators.Eval.quantizeScores]]).
    *
    * Null moments (the standard no-tie form — with heavy ties the z
    * is mildly conservative, the documented convention):
    * `E[J] = (N² − Σn_g²)/4` (emitted DOUBLED+×2 as mean4 = N²−Σn²),
    * `Var(J) = [N²(2N+3) − Σn_g²(2n_g+3)]/72`; z =
    * `(2·J2 − 2·mean4/... )` — concretely `z = (J2 − mean4/2) /
    * (2·√(var_num/72))` computed as one fixed double chain from the
    * exact integers (J = J2/2, so J − E[J] = (J2 − mean4/2)/2... the
    * chain below is literally `((j2 − mean4/2)/2)/√(var_num/72)`).
    *
    * Output per key: (key, n, n_groups, j2, mean4, var_num, z) — z
    * NULL when var_num = 0 (single group or constant outcome). */
  def jonckheereTerpstra(df: DataFrame, keyCol: String, groupCol: String,
                         valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(groupCol).as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // consumed 3x (pair join both sides + sizes)
    val a = cells.select(col(keyCol), col("__g").as("__ga"),
      col("__v").as("__va"), col("__c").as("__ca"))
    val b = cells.select(col(keyCol), col("__g").as("__gb"),
      col("__v").as("__vb"), col("__c").as("__cb"))
    val j = a.join(b, Seq(keyCol))
      .filter(col("__ga") < col("__gb"))
      .groupBy(col(keyCol))
      .agg(sum(col("__ca").cast(d38) * col("__cb")
        * (when(col("__va") < col("__vb"), 2L)
          .when(col("__va") === col("__vb"), 1L).otherwise(0L)))
        .cast(d38).cast("long").as("j2"))
    val sizes = cells.groupBy(col(keyCol), col("__g"))
      .agg(sum(col("__c")).as("__ng"))
      .groupBy(col(keyCol))
      .agg(sum(col("__ng")).cast("long").as("n"),
        count(lit(1)).cast("long").as("n_groups"),
        sum(col("__ng").cast(d38) * col("__ng")).cast(d38).cast("long")
          .as("__sn2"),
        sum(col("__ng").cast(d38) * col("__ng")
          * (lit(2L) * col("__ng") + 3)).cast(d38).cast("long").as("__sn23"))
    sizes.join(j, Seq(keyCol), "left")
      .withColumn("j2", coalesce(col("j2"), lit(0L))) // single group
      .withColumn("mean4",
        (col("n").cast(d38) * col("n") - col("__sn2")).cast(d38)
          .cast("long"))
      .withColumn("var_num",
        (col("n").cast(d38) * col("n") * (lit(2L) * col("n") + 3)
          - col("__sn23")).cast(d38).cast("long"))
      .withColumn("z",
        when(col("var_num") > 0,
          ((col("j2").cast("double") - col("mean4").cast("double") / 2.0)
            / 2.0)
            / sqrt(col("var_num").cast("double") / 72.0)))
      .select(col(keyCol), col("n"), col("n_groups"), col("j2"),
        col("mean4"), col("var_num"), col("z"))
  }

  /** Friedman test PARTS — the repeated-measures / blocked-design rank
    * test ([[kruskalWallis]] asks "do k independent samples differ?";
    * this asks "do k TREATMENTS differ when every block receives all
    * k?" — per-day metric across variants, per-document score across
    * models): within each block, treatments take doubled average-rank
    * midranks from the block's distinct-value cells (`2·C_prev + t +
    * 1` — the house tie convention), per-treatment doubled rank sums
    * accumulate exactly, and the statistic
    * `χ²_F = 12/(n·k·(k+1))·Σ_j R_j² − 3·n·(k+1)` evaluates as ONE
    * fixed double chain from the exact integers (with R_j = R2_j/2:
    * `3·Σ R2_j²/(n·k·(k+1)) − 3·n·(k+1)`). Ties within a block use
    * midranks; the no-tie χ² form is the documented convention
    * (mildly conservative under heavy ties).
    *
    * Every block must contain EVERY treatment exactly once —
    * validated in-plan (a ragged block raises); zero-fill or aggregate
    * upstream. Blocks×treatments is the whole frame — values-scale
    * windows only.
    *
    * Output per treatment: (treatment, n_blocks, k_treatments,
    * r2_sum, chi2) — chi2 identical on every row (the one-row
    * broadcast attach); NULL when k < 2. */
  def friedmanParts(df: DataFrame, blockCol: String, treatmentCol: String,
                    valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(blockCol).isNotNull
      && col(treatmentCol).isNotNull && col(valueCol).isNotNull)
      .select(col(blockCol).as("__b"),
        col(treatmentCol).cast("string").as("__t"), col(valueCol).as("__v"))
    // within-block doubled midranks from distinct-value cells
    val cells = base.groupBy(col("__b"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cells
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__rd",
        lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1L)
    val rows = base.join(ranked.select(col("__b"), col("__v"), col("__rd")),
      Seq("__b", "__v"))
    val perTreat = rows.groupBy(col("__t"))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        sum(col("__rd").cast(d38)).cast(d38).cast("long").as("r2_sum"))
    // completeness: every block has every treatment exactly once —
    // including GLOBALLY the same treatments: per-block counts alone
    // would pass two equal-size blocks with DISJOINT treatment sets
    // ({t1,t2} vs {t3,t4}), silently producing a wrong chi2 (k from
    // the per-block max while each treatment spans < n_blocks), so
    // the global distinct-treatment count must equal the per-block k
    val gk = base.agg(count_distinct(col("__t")).as("__kg"))
    val shape = rows.groupBy(col("__b"))
      .agg(count(lit(1)).as("__rows"),
        count_distinct(col("__t")).as("__kt"))
      .agg(count(lit(1)).cast("long").as("__nb"),
        min(col("__rows")).as("__rmin"), max(col("__rows")).as("__rmax"),
        min(col("__kt")).as("__kmin"), max(col("__kt")).as("__kmax"))
      .crossJoin(broadcast(gk))
      .withColumn("__k",
        when(col("__rmin") =!= col("__rmax")
          || col("__kmin") =!= col("__kmax")
          || col("__rmin") =!= col("__kmin")
          || col("__kmax") =!= col("__kg"), raise_error(lit(
          "friedmanParts: ragged design — every block must contain " +
            "every treatment exactly once; zero-fill upstream")))
          .otherwise(col("__kmax")).cast("long"))
      .select(col("__nb"), col("__k"))
    val ssum = perTreat.agg(
      sum(col("r2_sum").cast(d38) * col("r2_sum")).cast(d38).cast("long")
        .as("__sr2"))
    perTreat.crossJoin(broadcast(shape)).crossJoin(broadcast(ssum))
      .withColumn("k_treatments", col("__k"))
      .withColumn("chi2",
        when(col("__k") > 1,
          lit(3.0) * col("__sr2").cast("double")
            / (col("__nb").cast("double") * col("__k").cast("double")
              * (col("__k").cast("double") + 1.0))
            - lit(3.0) * col("__nb").cast("double")
              * (col("__k").cast("double") + 1.0)))
      .select(col("__t").as("treatment"), col("n_blocks"),
        col("k_treatments"), col("r2_sum"), col("chi2"))
  }

  /** Kendall's W (coefficient of concordance) — the [0, 1] EFFECT SIZE
    * of [[friedmanParts]] ("the χ² says the treatments differ; W says
    * how strongly the blocks AGREE on the ordering"): `W = χ²_F /
    * (n·(k−1))`. One row, derived from the same exact parts — the
    * [[graft.operators.Robust.cohensD]] no-drift convention (this
    * calls friedmanParts; the two can never disagree). NULL when
    * k < 2. Same complete-design contract (ragged raises upstream).
    *
    * Output: one row (n_blocks, k_treatments, chi2, kendall_w). */
  def kendallW(df: DataFrame, blockCol: String, treatmentCol: String,
               valueCol: String): DataFrame =
    friedmanParts(df, blockCol, treatmentCol, valueCol)
      .groupBy(col("n_blocks"), col("k_treatments"))
      .agg(max(col("chi2")).as("chi2")) // identical on every row
      .withColumn("kendall_w",
        when(col("k_treatments") > 1,
          col("chi2") / (col("n_blocks").cast("double")
            * (col("k_treatments").cast("double") - 1.0))))

  /** Cliff's delta — the ordinal effect size of [[mannWhitneyU]]
    * ("the U test says the two samples differ; δ ∈ [−1, 1] says how
    * often an A draw beats a B draw"): `δ = (#(a>b) − #(a<b))/(nA·nB)`
    * `= (u_a_doubled − u_b_doubled)/(2·nA·nB)` — derived from the SAME
    * doubled-U integers (ties cancel exactly in the difference), one
    * division. The conventional bands (|δ| < .147 negligible, < .33
    * small, < .474 medium) are the caller's readout.
    *
    * Output per key: (key, n_a, n_b, u_a_doubled, u_b_doubled,
    * cliffs_delta). */
  def cliffsDelta(df: DataFrame, keyCol: String, valueCol: String,
                  isA: Column): DataFrame =
    mannWhitneyU(df, keyCol, valueCol, isA)
      .withColumn("cliffs_delta",
        (col("u_a_doubled") - col("u_b_doubled")).cast("double")
          / (lit(2.0) * col("n_a").cast("double")
            * col("n_b").cast("double")))

  /** One-sample Kolmogorov–Smirnov against the UNIFORM on the key's
    * own empirical [min, max] — the goodness-of-fit member completing
    * the EDF family (two-sample KS/CvM/AD exist; the one-sample
    * normal needs Φ, libm, oracle-unsafe — uniform is the reference
    * distribution whose CDF is RATIONAL, so the whole statistic
    * clears to integers). Over the per-key distinct-value lattice
    * with R = hi − lo and n rows:
    *
    *   D⁺ at v: cum(v)·R − (v − lo)·n     (empirical above uniform)
    *   D⁻ at v: (v − lo)·n − cum_before(v)·R  (below, at the jump)
    *   d_num = max over v of max(D⁺, D⁻),  d_den = n·R,
    *   D = d_num / d_den — one division over exact BIGINTs.
    *
    * Integral values only (the cents contract). Output per key:
    * (key, n, lo, hi, d_num, d_den, d_stat) — NULL D when R = 0 (a
    * single-valued key has no range to test). */
  def ksUniformParts(df: DataFrame, keyCol: String,
                     valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = cells.groupBy(col(keyCol))
      .agg(min(col("__v")).cast("long").as("lo"),
        max(col("__v")).cast("long").as("hi"),
        sum(col("__c")).cast("long").as("n"))
    cells
      .withColumn("__cum", sum(col("__c")).over(w))
      .join(Broadcasts.maybeBroadcast(bounds), Seq(keyCol))
      .withColumn("__r", col("hi") - col("lo"))
      .withColumn("__tp",
        (col("__cum").cast(d38) * col("__r")
          - (col("__v") - col("lo")).cast(d38) * col("n")).cast(d38)
          .cast("long"))
      .withColumn("__tm",
        ((col("__v") - col("lo")).cast(d38) * col("n")
          - (col("__cum") - col("__c")).cast(d38) * col("__r"))
          .cast(d38).cast("long"))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        max(greatest(col("__tp"), col("__tm"))).as("d_num"),
        max((col("n").cast(d38) * col("__r")).cast(d38).cast("long"))
          .as("d_den"))
      .withColumn("d_stat",
        when(col("d_den") > 0L,
          col("d_num").cast("double") / col("d_den").cast("double")))
      .select(col(keyCol), col("n"), col("lo"), col("hi"),
        col("d_num"), col("d_den"), col("d_stat"))
  }

  /** Hodges–Lehmann two-sample shift estimator per key — the robust
    * "how much is A shifted above B?" companion to [[mannWhitneyU]]
    * (MWU answers whether a shift exists; HL estimates it as the
    * MEDIAN of all pairwise differences x_a − x_b — 50% breakdown,
    * no moments assumed — the estimator that inverts the MWU test).
    * Runs on per-key distinct-VALUE grids (the bounded-grid contract:
    * pre-quantize continuous inputs): the difference multiset is the
    * lattice_a × lattice_b join with count products as weights —
    * cells², never rows² — and the median uses the house lower-median
    * rule `min(d : 2·cum ≥ n_a·n_b)` over the ascending difference
    * lattice. Everything exact integers.
    *
    * Output per key: (key, n_a, n_b, n_pairs, hl_shift) in the value
    * column's own units (pass cents in, get cents out). NULL shift
    * when either side is empty. */
  def hodgesLehmannShift(df: DataFrame, keyCol: String, valueCol: String,
                         isA: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(isA, 0L).otherwise(1L)).as("__cb"))
      .localCheckpoint(true) // consumed by both sides of the grid join
    val a = cells.filter(col("__ca") > 0)
      .select(col(keyCol), col("__v").as("__va"), col("__ca"))
    val b = cells.filter(col("__cb") > 0)
      .select(col(keyCol), col("__v").as("__vb"), col("__cb"))
    val diffs = a.join(b, Seq(keyCol))
      .groupBy(col(keyCol), (col("__va") - col("__vb")).as("__d"))
      .agg(sum((col("__ca").cast(d38) * col("__cb")).cast(d38))
        .cast(d38).cast("long").as("__w"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy(col(keyCol))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"))
      .withColumn("n_pairs",
        (col("n_a").cast(d38) * col("n_b")).cast(d38).cast("long"))
    val hl = diffs
      .withColumn("__cum", sum(col("__w")).over(w))
      .join(Broadcasts.maybeBroadcast(tot.select(col(keyCol),
        col("n_pairs").as("__t"))), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(min(when(col("__cum") * 2 >= col("__t"), col("__d")))
        .as("hl_shift"))
    tot.join(hl, Seq(keyCol), "left")
      .select(col(keyCol), col("n_a"), col("n_b"), col("n_pairs"),
        col("hl_shift"))
  }

  /** Kendall τ-b MATRIX over k columns — the concordance twin of
    * [[spearmanMatrix]] (Spearman reads rank-linear association;
    * Kendall reads pairwise concordance, more robust to a few wild
    * ranks and the quantity sketch-comparison papers quote). Each
    * unordered pair runs [[kendallTau]]'s distinct-CELL machinery
    * (exact C/D/tie integers from the per-pair value-grid self-join —
    * the bounded-grid contract applies to every column: pre-quantize
    * continuous inputs). C(k,2) grid self-joins, each cells-scale,
    * never row-pairwise. Listwise NULL deletion (rows with a NULL in
    * ANY column drop), so every pair sees the same n — the
    * [[spearmanMatrix]] convention.
    *
    * Output per lexicographic pair: (col_a, col_b, n, concordant,
    * discordant, tie_pairs_a, tie_pairs_b, tau_b). */
  def kendallMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val base = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(col): _*)
      .localCheckpoint(true) // consumed by C(k,2) pair plans
    val pairs = cols.combinations(2).toSeq.map { case Seq(a0, b0) =>
      val (a, b) = if (a0 <= b0) (a0, b0) else (b0, a0)
      kendallTau(base.withColumn("__one", lit(1)), "__one", a, b)
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          col("concordant"), col("discordant"),
          col("tie_pairs_x").as("tie_pairs_a"),
          col("tie_pairs_y").as("tie_pairs_b"), col("tau_b"))
    }
    pairs.reduce(_.unionAll(_))
  }
}
