package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential conversion funnel over an event stream: how many keys
  * (users) performed step 1, then step 2 STRICTLY AFTER their first
  * qualifying step-1 event, then step 3 after that, … The strict
  * sequential semantics (each step's earliest timestamp must exceed the
  * previous step's reach time) is what separates a funnel from a bag of
  * per-step counts — a purchase before the first view does not convert.
  *
  * Shape at 100 TB: one aggregate per step, every one keyed on the same
  * key column — the event scan is filtered to one step's slice before
  * each aggregate, the reach table (one row per converted key, shrinking
  * monotonically) joins back on the key, and every exchange in the chain
  * hashes the same key, so Spark reuses the partitioning across steps.
  * No window over the full stream, no driver state, no all-pairs. The
  * final report aggregates the reach table into one row per step.
  */
object Funnel {

  /** Per-key reach times: (key, t_1 … t_k) with t_i = the earliest `tsCol`
    * of a `steps(i-1)` event strictly after t_(i-1) (t_1 = earliest step-1
    * event); NULL once the key falls out of the funnel. One row per key
    * that completed step 1.
    *
    * `maxGapSeconds` adds the TIME-CONSTRAINED variant: step i must
    * land within that many seconds of the previous step's reach time
    * (exact integer-microsecond comparison), the "did they convert
    * promptly" funnel — a qualifying event beyond the window drops the
    * key even if nothing else intervenes. Note the semantics stay
    * first-qualifying-event: t_i is the earliest in-window event after
    * t_(i-1), not a search over all (t_(i-1) candidate, t_i) pairings. */
  def reachTimes(df: DataFrame, keyCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String],
                 maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    val events = df.select(col(keyCol), col(typeCol), col(tsCol))
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t_1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prevT = s"t_${i + 1}"
      val curT = s"t_${i + 2}"
      val inWindow = maxGapSeconds.fold(lit(true)) { g =>
        unix_micros(col(tsCol).cast("timestamp")) -
          unix_micros(col(prevT).cast("timestamp")) <= lit(g * 1000000L)
      }
      val next = events.filter(col(typeCol) === step)
        .join(acc.select(col(keyCol), col(prevT)), Seq(keyCol))
        .filter(col(tsCol) > col(prevT) && inWindow)
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as(curT))
      acc.join(next.select(col(keyCol), col(curT)), Seq(keyCol), "left")
    }
  }

  /** The funnel report: one row per step — (step_index (1-based), step,
    * n_keys reaching it in sequence, conversion = n_keys/step-1 keys as an
    * exact integer-over-integer double). An empty step-1 cohort reports
    * zero rows-reached with conversion 0.0 for every step. */
  def conversion(df: DataFrame, keyCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String],
                 maxGapSeconds: Option[Long] = None): DataFrame = {
    val reach = reachTimes(df, keyCol, tsCol, typeCol, steps, maxGapSeconds)
    val counts = reach.agg(
      count(col("t_1")).as("n_1"),
      steps.indices.tail.map(i => count(col(s"t_${i + 1}")).as(s"n_${i + 1}")): _*)
    val perStep = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_index"), lit(step).as("step"),
        col(s"n_${i + 1}").as("n_keys"))
    }
    counts.select(explode(array(perStep: _*)).as("r"), col("n_1"))
      .select(col("r.step_index"), col("r.step"), col("r.n_keys"),
        when(col("n_1") === 0, 0.0)
          .otherwise(col("r.n_keys").cast("double") / col("n_1").cast("double"))
          .as("conversion"))
  }

  /** Time-to-convert per funnel step: for every key that reached step i,
    * the gap t_i − t_(i−1) in exact integer microseconds, aggregated to
    * (step_index, step, n_keys, avg/min/max gap). The avg is one
    * division of an exact BIGINT sum by the key count — engine-exact
    * like every ratio here. Steps nobody reached report n_keys = 0 with
    * NULL gap stats.
    *
    * Cost: [[reachTimes]]' chain plus k−1 single-row aggregates over
    * the (already small) reach table. */
  /** Experiment funnel: per step transition, the A/B conversion
    * comparison — units are keys that reached the FROM step, success is
    * reaching the TO step, scored with the libm-free 2x2 chi-squared
    * ([[Robust.abChiSquare]]). The answer to "did the variant move
    * step-2 conversion, or just traffic" that a plain per-variant
    * funnel cannot give without a significance column.
    *
    * `variantCol` must be constant per key (unit-level assignment — a
    * hash of the key is the standard deterministic form); the per-key
    * variant is read via `max` over the key's events. Costs
    * [[reachTimes]] once plus one tiny aggregate per transition. */
  def abFunnel(df: DataFrame, keyCol: String, tsCol: String,
               typeCol: String, steps: Seq[String],
               variantCol: String): DataFrame = {
    require(steps.size >= 2, "abFunnel needs at least two steps")
    val variants = df.groupBy(col(keyCol))
      .agg(max(col(variantCol)).as("__variant"))
    val reach = reachTimes(df, keyCol, tsCol, typeCol, steps)
      .join(variants, Seq(keyCol))
    steps.indices.tail.map { i =>
      val units = reach.filter(col(s"t_$i").isNotNull)
        .select(col("__variant").as("variant"),
          col(s"t_${i + 1}").isNotNull.cast("int").as("converted"))
      Robust.abChiSquare(units, "variant", "converted")
        .select(lit(i).as("step_index"),
          lit(steps(i - 1)).as("from_step"), lit(steps(i)).as("to_step"),
          col("variant_a"), col("variant_b"), col("n_a"), col("conv_a"),
          col("n_b"), col("conv_b"), col("rate_a"), col("rate_b"),
          col("chi2"))
    }.reduce(_ unionByName _)
  }

  def stepGaps(df: DataFrame, keyCol: String, tsCol: String,
               typeCol: String, steps: Seq[String],
               maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "stepGaps needs at least two steps")
    val reach = reachTimes(df, keyCol, tsCol, typeCol, steps, maxGapSeconds)
    steps.indices.tail.map { i =>
      val g = unix_micros(col(s"t_${i + 1}").cast("timestamp")) -
        unix_micros(col(s"t_$i").cast("timestamp"))
      reach.filter(col(s"t_${i + 1}").isNotNull)
        .agg(count(lit(1)).as("n_keys"),
          (sum(g).cast("double") / count(lit(1)).cast("double")).as("avg_gap_us"),
          min(g).as("min_gap_us"), max(g).as("max_gap_us"))
        .select(lit(i + 1).cast("int").as("step_index"),
          lit(steps(i)).as("step"), col("n_keys"),
          col("avg_gap_us"), col("min_gap_us"), col("max_gap_us"))
    }.reduce(_.unionByName(_))
  }

  /** Funnel scoped to gap-sessions instead of whole users: a session (a
    * burst of activity separated by > `gapSeconds` of silence, per
    * [[Sessionize.tag]]) converts only if the steps happen in order
    * WITHIN it — the "did the user view, click and buy in one sitting"
    * question, stricter than the lifetime funnel above.
    *
    * Composition: one key shuffle to tag sessions, then the per-step
    * aggregates keyed on the (user, session) composite — rendered as one
    * string column because every step aggregate re-keys on it anyway and
    * a single column keeps the reach-table joins narrow. Same
    * scale shape as [[conversion]]; the session tag adds no exchange
    * beyond its own (user-keyed) one. */
  def sessionConversion(df: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, tieBreakCol: String,
                        gapSeconds: Long, steps: Seq[String]): DataFrame = {
    // conversion() scans its input once per step; the session tag is a
    // full shuffle+window, so materialize it ONCE (projected to the three
    // funnel columns) instead of recomputing it per step — measured 32s
    // -> ~4s at sf0.1. Sessionization must see ALL the user's events
    // (gaps are defined over every event, not just funnel steps), so the
    // step filter cannot be pushed below the tag.
    // NOTE: localCheckpoint(true) runs an eager Spark job HERE, at
    // DataFrame-construction time, and the checkpoint blocks stay on the
    // executors until the returned frame becomes unreachable (Spark's
    // ContextCleaner releases them on GC). Callers holding many results
    // long-term should collect/write the result, then drop the reference.
    val tagged = Sessionize.tag(df, userCol, tsCol, gapSeconds, tieBreakCol)
      .withColumn("__skey", concat_ws(":",
        col(userCol).cast("string"), col("session_index").cast("string")))
      .select(col("__skey"), col(tsCol), col(typeCol))
      .filter(col(typeCol).isin(steps: _*)) // post-tag slice IS safe
      .localCheckpoint(true)
    conversion(tagged, "__skey", tsCol, typeCol, steps)
  }
}
