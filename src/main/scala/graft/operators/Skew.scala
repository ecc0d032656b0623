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
}
