package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy risk profiling for publishable datasets: k-anonymity and
  * l-diversity over declared quasi-identifier columns — the release
  * gate a data-sharing pipeline runs before an extract leaves the
  * boundary. A row is re-identifiable when its quasi-identifier
  * combination is rare (k-anonymity: every equivalence class must have
  * ≥ k members) and attribute-disclosable when its class is uniform in
  * the sensitive column (l-diversity: every class must carry ≥ l
  * distinct sensitive values).
  *
  * All outputs are exact BIGINT counts and single divisions — the
  * oracle gate hashes them. NULL is treated as a VALUE in the
  * quasi-identifier (two rows with NULL zip codes are in the same
  * class — the standard release-audit convention, and the
  * null-safe-grouping default both engines share).
  *
  * Scale shape: ONE hash aggregate on the quasi-identifier tuple
  * (map-side combined) carrying count + distinct-sensitive per class,
  * then class-scale summaries. Nothing after the first aggregate
  * touches row scale; no window, no collect.
  */
object Privacy {

  /** Per-equivalence-class audit: (qi columns..., class_size,
    * n_sensitive_values, at_risk_k, at_risk_l). Classes sorted out by
    * the caller; use [[kAnonymityReport]] for the dataset-level
    * verdict. `sensitiveCol = None` skips diversity (l ignored). */
  def equivalenceClasses(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: Option[String], k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "quasi-identifier columns required")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    val aggs = Seq(count(lit(1)).as("class_size")) ++
      sensitiveCol.map(s =>
        countDistinct(col(s)).as("n_sensitive_values")).toSeq
    val base = df.groupBy(qiCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val withL = sensitiveCol.fold(
      base.withColumn("n_sensitive_values", lit(null).cast("long")))(_ => base)
    withL
      .withColumn("at_risk_k", col("class_size") < k)
      .withColumn("at_risk_l",
        sensitiveCol.fold(lit(null).cast("boolean"))(_ =>
          col("n_sensitive_values") < l))
  }

  /** Dataset-level k-anonymity / l-diversity verdict: the achieved k
    * (smallest class) and l (least-diverse class), how many classes and
    * ROWS fail each bar, the suppression cost (share of rows that would
    * have to be dropped to reach k), and the pass/fail verdicts. One
    * row. */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: Option[String], k: Int, l: Int): DataFrame = {
    val classes = equivalenceClasses(df, qiCols, sensitiveCol, k, l)
    val lAggs =
      if (sensitiveCol.isDefined) Seq(
        min(col("n_sensitive_values")).as("achieved_l"),
        sum(when(col("at_risk_l"), lit(1L)).otherwise(lit(0L)))
          .cast("long").as("n_classes_below_l"),
        sum(when(col("at_risk_l"), col("class_size")).otherwise(lit(0L)))
          .cast("long").as("n_rows_below_l"))
      else Seq(
        lit(null).cast("long").as("achieved_l"),
        lit(null).cast("long").as("n_classes_below_l"),
        lit(null).cast("long").as("n_rows_below_l"))
    val aggs = Seq(
      count(lit(1)).as("n_classes"),
      sum(col("class_size")).cast("long").as("n_rows"),
      min(col("class_size")).as("achieved_k"),
      sum(when(col("at_risk_k"), lit(1L)).otherwise(lit(0L)))
        .cast("long").as("n_classes_below_k"),
      sum(when(col("at_risk_k"), col("class_size")).otherwise(lit(0L)))
        .cast("long").as("n_rows_below_k")) ++ lAggs
    classes.agg(aggs.head, aggs.tail: _*)
      .withColumn("suppression_rate",
        col("n_rows_below_k").cast("double") / col("n_rows").cast("double"))
      .withColumn("k_anonymous", col("achieved_k") >= k)
      .withColumn("l_diverse",
        if (sensitiveCol.isDefined) col("achieved_l") >= l
        else lit(null).cast("boolean"))
  }

  /** Column-level PII screening: for each listed string column, the
    * share of non-NULL values matching email / phone-length digit-run /
    * 13-19-digit card patterns — the "which columns must never leave
    * the boundary" scan a data catalog runs before classifying an
    * extract, complementing [[kAnonymityReport]] (quasi-identifier
    * risk) with direct-identifier detection. Patterns are RE2-safe
    * regexes (the redactPii discipline) so the oracle runs them
    * verbatim; card hits additionally validate the Luhn checksum via
    * the same exact integer fold as `TextAnalysis.luhnCardScan`.
    *
    * One map stage and one nColumns-row aggregate per column, unioned
    * at metadata scale; flagged = any share ≥ `flagAt`. */
  def piiColumnScan(df: DataFrame, cols: Seq[String],
                    flagAt: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "columns to scan required")
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val perCol = cols.map { c =>
      val v = col(c).cast("string")
      val luhnTot = expr(
        """aggregate(transform(sequence(1, length(__digits)), i ->
          |  CASE WHEN (i - 1) % 2 = 0
          |    THEN cast(substr(reverse(__digits), i, 1) as int)
          |    ELSE CASE WHEN 2 * cast(substr(reverse(__digits), i, 1) as int) > 9
          |      THEN 2 * cast(substr(reverse(__digits), i, 1) as int) - 9
          |      ELSE 2 * cast(substr(reverse(__digits), i, 1) as int) END
          |  END), 0, (acc, x) -> acc + x)""".stripMargin)
      df.select(v.as("__v"))
        .filter(col("__v").isNotNull)
        .withColumn("__digits", regexp_replace(col("__v"), "[^0-9]", ""))
        .select(
          lit(c).as("column_name"),
          lit(1L).as("__one"),
          col("__v").rlike(emailRe).cast("long").as("__email"),
          (length(col("__digits")).between(7, 12) &&
            col("__v").rlike("^[0-9 ()+.-]+$")).cast("long").as("__phone"),
          (length(col("__digits")).between(13, 19) &&
            (luhnTot % 10 === 0)).cast("long").as("__card"))
        .groupBy(col("column_name"))
        .agg(sum(col("__one")).as("n_values"),
          sum(col("__email")).as("n_email"),
          sum(col("__phone")).as("n_phone"),
          sum(col("__card")).as("n_card_luhn"))
    }
    perCol.reduce(_ unionByName _)
      .withColumn("email_share",
        col("n_email").cast("double") / col("n_values").cast("double"))
      .withColumn("phone_share",
        col("n_phone").cast("double") / col("n_values").cast("double"))
      .withColumn("card_share",
        col("n_card_luhn").cast("double") / col("n_values").cast("double"))
      .withColumn("flagged",
        col("email_share") >= flagAt || col("phone_share") >= flagAt ||
          col("card_share") >= flagAt)
  }

  /** t-closeness over an ORDINAL sensitive attribute — the third leg of
    * the release gate (k-anonymity bounds re-identification,
    * l-diversity bounds uniform disclosure; t-closeness bounds how much
    * a class's sensitive DISTRIBUTION leaks vs the global one —
    * Li/Li/Venkatasubramanian 2007): per equivalence class, the Earth
    * Mover's Distance to the global distribution under the
    * equal-spaced ordinal ground distance,
    * `EMD = Σ_v |CumP_v − CumQ_v| / (m−1)` over the ordered sensitive
    * domain.
    *
    * Exactness: the cumulative-difference sum clears denominators —
    * `emd_num = Σ_v |cumc_v·N − cumg_v·n|` is an exact BIGINT over the
    * (class × sensitive-domain) lattice (classes join the broadcast
    * m-value global lattice, absent cells count 0), and
    * `emd = emd_num/(n·N·(m−1))` is one division. The last lattice
    * value's term is identically 0 (both cums hit their totals), so
    * summing all m values equals the defining m−1-term sum. BIGINT
    * bound: emd_num ≤ m·n·N — past ~2e18 (e.g. N=1e9, n=2e3, m=1e6)
    * the ANSI cast fails loudly.
    *
    * NULL sensitive rows are EXCLUDED (an ordinal distance needs an
    * ordered value; NULL has no position — unlike the k/l gates where
    * NULL is a value). NULL quasi-identifiers group as values, the
    * [[equivalenceClasses]] convention.
    *
    * Scale shape: one (qi, sensitive) aggregate, a broadcast join to
    * the m-row global lattice, one per-class values-scale window.
    *
    * Output per class: (qiCols…, class_size, emd_num, emd,
    * at_risk_t = emd > t). */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 t: Double): DataFrame = {
    require(qiCols.nonEmpty, "quasi-identifier columns required")
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val base = df.filter(col(sensitiveCol).isNotNull)
    val cells = base
      .groupBy(qiCols.map(col) :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(true) // consumed for classes + lattice join
    val classes = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__cnt")).cast("long").as("class_size"))
    // global ordered lattice with its own cumulative counts (m rows)
    val gw = Window.orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = cells.groupBy(col("__s"))
      .agg(sum(col("__cnt")).cast("long").as("__gc"))
      .withColumn("__cumg", sum(col("__gc")).over(gw).cast("long"))
      .crossJoin(broadcast(
        cells.agg(sum(col("__cnt")).cast("long").as("__n_total"),
          count_distinct(col("__s")).cast("long").as("__m"))))
      .localCheckpoint(true) // m-row metadata frame, consumed per class
    val cw = Window.partitionBy(qiCols.map(col): _*).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-safe (<=>) equality on the quasi-identifiers: a NULL qi is a
    // VALUE (scaladoc convention) and must still match its own cells
    val cellsR = cells.select(
      qiCols.map(c => col(c).as(s"__r_$c")) :+ col("__s").as("__rs")
        :+ col("__cnt"): _*)
    val joinCond = qiCols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _) && col("__s") === col("__rs")
    classes
      .join(broadcast(global)) // class × m lattice
      .join(cellsR, joinCond, "left")
      .withColumn("__cnt", coalesce(col("__cnt"), lit(0L)))
      .withColumn("__cumc", sum(col("__cnt")).over(cw).cast("long"))
      .withColumn("__term",
        abs(col("__cumc") * col("__n_total")
          - col("__cumg") * col("class_size")))
      .groupBy(qiCols.map(col) :+ col("class_size") :+ col("__n_total")
        :+ col("__m"): _*)
      .agg(sum(col("__term")).cast("long").as("emd_num"))
      .withColumn("emd",
        when(col("__m") > 1,
          col("emd_num").cast("double")
            / (col("class_size").cast("double")
              * col("__n_total").cast("double")
              * (col("__m").cast("double") - 1.0))))
      .withColumn("at_risk_t", col("emd") > t)
      .select(qiCols.map(col) ++ Seq(col("class_size"), col("emd_num"),
        col("emd"), col("at_risk_t")): _*)
  }
}
