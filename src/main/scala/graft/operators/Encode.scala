package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe categorical feature encoding for model-training
  * pipelines. Plain target encoding (replace a category with the mean
  * target over its rows) leaks the row's own label into its feature;
  * the standard fix is K-fold out-of-fold (OOF) encoding: a row in fold
  * f is encoded with the mean computed over the OTHER folds only.
  *
  * This operator emits the ENCODING TABLE — (category, fold) →
  * out-of-fold mean — rather than a per-row join result: the table is
  * (categories × folds)-scale metadata a training job broadcasts, and
  * the per-row application is one map-side join the caller owns.
  *
  * Exactness/scale discipline: fold assignment is the repo's md5-draw
  * convention (deterministic, engine-portable — never `rand()`); target
  * sums ride decimal(20,6)→(38,6) (order-free); each OOF mean is ONE
  * double division. Shape: one (category, fold) hash aggregate with
  * map-side combine, a categories-scale rollup joined back, and a
  * one-row global prior broadcast-crossed in. Nothing global, no
  * windows. */
object Encode {

  /** Bayesian-average (additive-smoothed) rate table — the standard
    * fix for small-sample rate ranking (a 1/1 item must not outrank a
    * 980/1000 one): per category,
    * `smoothed = (pos + s·p_global)/(n + s)` with integer pseudo-count
    * strength `s` and the GLOBAL rate as the prior. Exact: cross-
    * multiplied to `(pos·gN + s·gPos)/(gN·(n + s))` — numerator and
    * denominator are exact integers (decimal internally, BIGINT out;
    * num ≤ n·gN so the BIGINT emission holds while n·gN ≤ 9e18 —
    * category-scale counts, comfortably inside at any real corpus),
    * and the smoothed rate is ONE division. Rows with NULL category or
    * flag drop.
    *
    * Output: (category, n, n_pos, smooth_num, smooth_den, smoothed). */
  def bayesianAverage(df: DataFrame, catCol: String, isPositive: Column,
                      strength: Long): DataFrame = {
    require(strength >= 1, s"strength must be >= 1, got $strength")
    val d38 = "decimal(38,0)"
    val perCat = df.filter(col(catCol).isNotNull && isPositive.isNotNull)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("n"),
        sum(when(isPositive, 1L).otherwise(0L)).as("n_pos"))
    val globals = perCat.agg(sum(col("n")).cast("long").as("__gn"),
      sum(col("n_pos")).cast("long").as("__gp"))
    perCat.crossJoin(broadcast(globals))
      .withColumn("smooth_num",
        (col("n_pos").cast(d38) * col("__gn")
          + lit(strength).cast(d38) * col("__gp")).cast(d38).cast("long"))
      .withColumn("smooth_den",
        (col("__gn").cast(d38) * (col("n") + strength)).cast(d38)
          .cast("long"))
      .withColumn("smoothed",
        col("smooth_num").cast("double") / col("smooth_den").cast("double"))
      .drop("__gn", "__gp")
  }

  /** OOF encoding table. `idCol` seeds the fold draw (any stable row
    * id — it must be NON-NULL: md5(NULL) is NULL and a silent NULL
    * fold bucket would skew every fold's OOF mean, so NULL-id rows are
    * rejected loudly below, matching the repo's loud-failure
    * convention); `nFolds` ≥ 2; rows with NULL target are excluded
    * from means (SQL AVG semantics). Categories seen in only one fold
    * fall back
    * to the GLOBAL mean for that fold's rows (`is_prior` = true) —
    * there is no other-fold evidence to use.
    *
    * Output: (category, fold, n_in_fold, n_oof, mean_oof, is_prior). */
  def targetEncodeOOF(df: DataFrame, catCol: String, targetCol: String,
                      idCol: String, nFolds: Int,
                      salt: String = ""): DataFrame = {
    require(nFolds >= 2, s"nFolds must be >= 2, got $nFolds")
    val rows = df
      .filter(col(targetCol).isNotNull)
      .select(col(catCol).as("category"),
        col(targetCol).cast("decimal(20,6)").as("__t"),
        // loud contract check: raise_error (not a silent NULL bucket)
        // on NULL ids — evaluated per row map-side, no extra pass
        (conv(substring(md5(concat(
          when(col(idCol).isNull, raise_error(lit(
            s"targetEncodeOOF: NULL $idCol — the fold draw needs a " +
              "non-null stable row id")))
            .otherwise(col(idCol).cast("string")), lit(salt))),
          1, 8), 16, 10).cast("long") % nFolds).cast("int").as("fold"))
    val perFold = rows.groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n_in_fold"),
        sum(col("__t")).cast("decimal(38,6)").as("__s"))
    val perCat = perFold.groupBy(col("category"))
      .agg(sum(col("n_in_fold")).as("__n_tot"),
        sum(col("__s")).cast("decimal(38,6)").as("__s_tot"))
    val prior = rows.agg(
      (sum(col("__t")).cast("decimal(38,6)").cast("double")
        / count(lit(1)).cast("double")).as("__prior"))
    perFold
      .join(Broadcasts.maybeBroadcast(perCat), Seq("category"))
      .crossJoin(broadcast(prior))
      .withColumn("n_oof", col("__n_tot") - col("n_in_fold"))
      .withColumn("is_prior", col("n_oof") === 0L)
      .withColumn("mean_oof",
        when(!col("is_prior"),
          (col("__s_tot") - col("__s")).cast("double")
            / col("n_oof").cast("double"))
          .otherwise(col("__prior")))
      .select(col("category"), col("fold"), col("n_in_fold"),
        col("n_oof"), col("mean_oof"), col("is_prior"))
  }
}
