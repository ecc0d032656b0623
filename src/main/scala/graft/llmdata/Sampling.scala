package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for LLM training-data pipelines (EXT
  * surface): corpus curation needs repeatable samples — the same inputs
  * must yield the same sample on every run, engine, and cluster size, or
  * training mixes are irreproducible. `rand()` fails all three, so every
  * operator here derives its randomness from an md5 content hash: pure
  * map-stage expressions, codegen'd, and mirrored exactly by the DuckDB
  * oracles.
  */
object Sampling {

  /** Uniform-in-[0,1) hash fraction of a key: the first 8 md5 hex chars as
    * a 32-bit integer over 2^32. Deterministic and engine-portable. */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Stratified Bernoulli sample with per-stratum rates: keep a row iff
    * its key's hash fraction falls under its stratum's rate (`defaultRate`
    * for unlisted strata). The classic training-mix downsampler (e.g.
    * per-language rates); one map stage, no shuffle, no state. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, r).otherwise(acc)
    }
    df.filter(hashFraction(col(keyCol)) < rate)
  }

  /** Fixed-size per-stratum sample: the `n` rows with the smallest hash
    * fractions in each stratum (ties broken by key) — a deterministic
    * reservoir-sample analog. One shuffle on the stratum key; the window
    * top-n is map-side-limited by WindowGroupLimit. */
  def perStratumSample(df: DataFrame, keyCol: String, stratumCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashFraction(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
