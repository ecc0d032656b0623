package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Marketing-style conversion attribution over an event stream — which
  * touch (ad view, click, …) gets credit for a later conversion. The
  * reference's stack has no attribution operator; this is part of the
  * EXT analytics surface alongside funnels (Funnel) and retention
  * (Retention).
  *
  * Last-touch model: each conversion is credited to the MOST RECENT
  * touch event by the same user at-or-before the conversion instant,
  * provided it falls within `lookbackSeconds`; conversions with no
  * in-window touch are credited to the `organic` channel.
  *
  * Built on [[AsOfJoin.asOf]] (one shuffle of touches ∪ conversions on
  * the user key, a single running window — no per-conversion range
  * probe), then a map-stage age gate: if the LATEST touch is older than
  * the lookback, every touch is, so the post-filter loses nothing. Age
  * is compared in integer microseconds (`unix_micros`) — exact on any
  * engine. Tie semantics inherit from asOf: a touch at the conversion
  * instant is visible; simultaneous touches resolve to the largest
  * touch id.
  */
object Attribution {

  /** Per-conversion attribution table: every column of the conversion
    * row, plus `channel` (the credited touch's type, or 'organic'),
    * `touch_id` and `touch_ts` (NULL when organic). */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, idCol: String,
                touchTypes: Seq[String], conversionType: String,
                lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    val conv = events.filter(col(typeCol) === conversionType)
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__touch_ts", col(tsCol))
    val joined = AsOfJoin.asOf(conv, touch, userCol, tsCol,
      rightIdCol = idCol, rightPayload = Seq(typeCol, "__touch_ts"))
    val asofTs = col("asof___touch_ts")
    val ageUs = unix_micros(col(tsCol).cast("timestamp")) -
      unix_micros(asofTs.cast("timestamp"))
    joined
      .withColumn("__in_window",
        asofTs.isNotNull && ageUs <= lit(lookbackSeconds) * lit(1000000L))
      .withColumn("channel",
        when(col("__in_window"), col(s"asof_$typeCol")).otherwise(lit("organic")))
      .withColumn("touch_id", when(col("__in_window"), col(s"asof_$idCol")))
      .withColumn("touch_ts", when(col("__in_window"), asofTs))
      .drop(s"asof_$idCol", s"asof_$typeCol", "asof___touch_ts", "__in_window")
  }

  /** Channel-level rollup of [[lastTouch]]: conversions and exact
    * revenue credited per channel (decimal-path sum, one final cast). */
  def channelReport(attributed: DataFrame, valueCol: String): DataFrame =
    attributed.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        graft.functions.ScalarFns.exactSum(col(valueCol)).as("sum_value"))

  /** Multi-touch attribution: every in-window touch shares one
    * conversion's credit, instead of winner-take-all.
    *
    * Models (both EXACT, no doubles in the credit path):
    *  - linear (`halfLifeSeconds = None`): every touch weight 1;
    *  - time-decay (`Some(h)`): staircase half-life weights
    *    `2^(maxShift - floor(age/h))` (clamped at maxShift) — the q171
    *    integer-shift decay pattern, so weights are exact BIGINTs, not
    *    libm `pow` doubles.
    *
    * Credit is integer MICRO-credits: each conversion carries exactly
    * 1,000,000 micros; touch i gets `w_i * 1e6 div W` and the division
    * remainder goes to the LAST touch (latest ts, ties largest id —
    * the same tie rule lastTouch credits), so per-conversion credit
    * sums to exactly 1e6 in any engine at any parallelism. Conversions
    * with no in-window touch emit one 'organic' row with full credit.
    *
    * Scale shape: one equi-join on the user key with a time-band
    * predicate (per-user touch×conversion fan-out is bounded by user
    * activity — the inherent cost of multi-touch), then two windows
    * partitioned by conversion id. No global sort, no cross join.
    * Output: one row per (conversion, credited touch):
    * (user, conv_id, conv_ts, touch_id, channel, weight, credit_micro).
    */
  def multiTouch(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, idCol: String,
                 touchTypes: Seq[String], conversionType: String,
                 lookbackSeconds: Long,
                 halfLifeSeconds: Option[Long] = None,
                 maxShift: Int = 30): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("user"), col(tsCol).as("conv_ts"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("user"), col(tsCol).as("touch_ts"),
        col(idCol).as("touch_id"), col(typeCol).as("channel"))
    val ageUs = unix_micros(col("conv_ts").cast("timestamp")) -
      unix_micros(col("touch_ts").cast("timestamp"))
    val pairs = conv.join(touch,
      conv("user") === touch("user") &&
        col("touch_ts") <= col("conv_ts") &&
        ageUs <= lit(lookbackSeconds) * lit(1000000L), "left")
      .select(conv("user"), col("conv_ts"), col("conv_id"),
        col("touch_ts"), col("touch_id"), col("channel"))
      .withColumn("__age_us",
        unix_micros(col("conv_ts").cast("timestamp")) -
          unix_micros(col("touch_ts").cast("timestamp")))
    val weight = halfLifeSeconds match {
      case None => lit(1L)
      case Some(h) =>
        require(h > 0, "half-life must be positive")
        // integer staircase: full weight in the first half-life, halved
        // each subsequent one, floored after maxShift halvings
        expr(s"shiftleft(1L, cast($maxShift - least(__age_us div ${h * 1000000L}, " +
          s"${maxShift.toLong}L) as int))")
    }
    creditFromWeights(
      pairs.withColumn("weight", when(col("touch_id").isNotNull, weight)))
  }

  /** Shared micro-credit division over per-conversion weighted touch
    * pairs: `w·1e6 div W` with the remainder to the LAST touch, organic
    * rows full credit — per-conversion credit sums to exactly 1e6. */
  private def creditFromWeights(weighted: DataFrame): DataFrame = {
    val wConv = org.apache.spark.sql.expressions.Window.partitionBy(col("conv_id"))
    val wLast = org.apache.spark.sql.expressions.Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    weighted
      .withColumn("__w_total", sum(col("weight")).over(wConv))
      .withColumn("__base",
        expr("(weight * 1000000L) div __w_total"))
      .withColumn("__rn", row_number().over(wLast))
      .withColumn("__base_total", sum(col("__base")).over(wConv))
      .withColumn("credit_micro",
        when(col("touch_id").isNull, lit(1000000L)) // organic
          .when(col("__rn") === 1,
            col("__base") + (lit(1000000L) - col("__base_total")))
          .otherwise(col("__base")))
      .withColumn("channel", coalesce(col("channel"), lit("organic")))
      .select("user", "conv_id", "conv_ts", "touch_id", "channel",
        "weight", "credit_micro")
  }

  /** U-shaped (positional) multi-touch: 40% to the FIRST touch, 40% to
    * the LAST, 20% split evenly across the middles — the standard
    * position-based model, expressed as EXACT integer weights so the
    * micro-credit discipline holds: for n ≥ 3 touches, first/last get
    * weight `40·(n−2)` and each middle `20` (total `100·(n−2)`, shares
    * exactly 40/40/20·…); n ≤ 2 degenerates to an equal split (50/50,
    * or full credit for a single touch), which is also the standard
    * convention. Same join shape, windows, tie rules, remainder-to-last
    * rule, and organic fallback as [[multiTouch]]. */
  def multiTouchPositional(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, idCol: String,
                           touchTypes: Seq[String], conversionType: String,
                           lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("user"), col(tsCol).as("conv_ts"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("user"), col(tsCol).as("touch_ts"),
        col(idCol).as("touch_id"), col(typeCol).as("channel"))
    val ageUs = unix_micros(col("conv_ts").cast("timestamp")) -
      unix_micros(col("touch_ts").cast("timestamp"))
    val pairs = conv.join(touch,
      conv("user") === touch("user") &&
        col("touch_ts") <= col("conv_ts") &&
        ageUs <= lit(lookbackSeconds) * lit(1000000L), "left")
      .select(conv("user"), col("conv_ts"), col("conv_id"),
        col("touch_ts"), col("touch_id"), col("channel"))
    val wConv = org.apache.spark.sql.expressions.Window.partitionBy(col("conv_id"))
    val wAsc = org.apache.spark.sql.expressions.Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").asc, col("touch_id").asc)
    creditFromWeights(pairs
      .withColumn("__n", count(col("touch_id")).over(wConv))
      .withColumn("__pos", row_number().over(wAsc))
      .withColumn("weight",
        when(col("touch_id").isNull, lit(null).cast("long"))
          .when(col("__n") <= 2, lit(1L))
          .when(col("__pos") === 1 || col("__pos") === col("__n"),
            lit(40L) * (col("__n") - 2))
          .otherwise(lit(20L)))
      .drop("__n", "__pos"))
  }

  /** Channel rollup of [[multiTouch]]: touches, distinct conversions,
    * exact micro-credit total, and the credit in conversions (ONE
    * final double division — exact-rounded, engine-identical). */
  def channelCredit(credited: DataFrame): DataFrame =
    credited.groupBy(col("channel"))
      .agg(count(col("touch_id")).as("n_touches"),
        countDistinct(col("conv_id")).as("n_conversions"),
        sum(col("credit_micro")).as("credit_micro"))
      .withColumn("credit",
        col("credit_micro").cast("double") / lit(1000000.0))
}
