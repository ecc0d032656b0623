package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (SURVEY.md §7.4 item 9 /
  * build-brief scale posture). AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) covers
  * sort-merge joins at runtime; these helpers cover the two shapes AQE
  * does not: skewed aggregations and broadcast-ineligible skewed joins
  * with a known-small dimension side.
  */
object Skew {

  /** Two-phase (salted) aggregation: spread each hot key over `salts`
    * partial groups, aggregate, then merge. Correct for any algebraic
    * aggregate expressed as (partial, merge) pairs.
    *
    * Example — count+sum per key with 16-way salting:
    * {{{
    * saltedAgg(df, Seq("k"), 16,
    *   partial = Seq(count(lit(1)).as("c"), sum($"v").as("s")),
    *   merge   = Seq(sum($"c").as("c"), sum($"s").as("s")))
    * }}}
    * At 100 TB a single hot key otherwise pins one reducer; salting bounds
    * any reducer's share to ~1/salts of the hot key's rows. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*).agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted join for a skewed fact against a small dimension that is still
    * too big (or explicitly not wanted) as a broadcast: replicate each
    * dimension row `salts` times, salt the fact rows randomly-but-
    * deterministically, and equi-join on (key, salt). Bounds the biggest
    * join partition at the cost of `salts`× the dimension shuffle. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(key), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-skew diagnosis: BEFORE running an expensive equi-join, rank
    * the keys by their exact output contribution n_left(k) · n_right(k)
    * — the number the shuffle-join reducer for key k must produce. One
    * key carrying a large `share` of `total_rows` is the signal to
    * reach for [[saltedJoin]] / AQE skew handling (or to question the
    * join's key choice entirely). Keys present on one side only
    * contribute 0 but still appear in the histograms.
    *
    * Shape at 100 TB: each side collapses to its key histogram FIRST
    * (map-side combinable count agg — the full fact tables never meet),
    * the histograms full-outer join at key cardinality, and top-N is a
    * distributed TakeOrdered, not a global window; only the N survivors
    * see a single partition (rank + broadcast total). Deterministic:
    * ties order by key. */
  def joinSkewReport(left: DataFrame, right: DataFrame, keyCol: String,
                     topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val la = left.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_left"))
    val ra = right.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_right"))
    val j = la.join(ra, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("contribution",
        (col("n_left") * col("n_right")).cast("long"))
    val total = j.agg(sum(col("contribution")).cast("long").as("total_rows"))
    val top = j.orderBy(col("contribution").desc, col(keyCol).asc).limit(topN)
    top.crossJoin(broadcast(total))
      .withColumn("share",
        // disjoint key sets → total_rows = 0; a defined 0.0 beats NaN
        when(col("total_rows") > 0,
          col("contribution").cast("double") / col("total_rows").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("contribution").desc, col(keyCol).asc)))
  }
}
