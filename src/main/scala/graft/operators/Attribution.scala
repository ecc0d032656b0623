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
}
