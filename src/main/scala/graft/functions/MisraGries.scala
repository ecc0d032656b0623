package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Mergeable heavy-hitters (frequent-items) partials via the Misra-Gries
  * summary — the third member of the partial-maintenance family
  * (COUNT/SUM/MIN/MAX: `operators.AggMerge`; DISTINCT: its HLL sketches):
  * "top sources / top tokens per day" over an unbounded item domain,
  * maintained incrementally without rescanning history.
  *
  * The summary keeps at most `capacity` (item → weight) counters. When a
  * new item overflows a full summary, ALL counters decrement by one
  * (dropping zeros) — the classic one-pass algorithm. Merging two
  * summaries is pointwise weight sum followed by the same compression:
  * subtract the (capacity+1)-th largest weight from every counter and
  * drop non-positive ones (Agarwal et al., "Mergeable Summaries", PODS
  * 2012 — the bound below survives ANY merge tree).
  *
  * Error contract: every retained weight UNDERESTIMATES the item's true
  * count by at most N/(capacity+1) (N = total items in the group), any
  * item with true count above that bound is guaranteed present, and the
  * summary is EXACT — weights equal true counts, merge-order-independent
  * — whenever a group's distinct-item count never exceeds `capacity`
  * (no decrement ever fires). The q149 oracle runs in that regime; the
  * specs exercise the decrement path.
  *
  * Shape at 100 TB: the udaf participates in partial aggregation (
  * map-side combine shrinks each partition to ≤ capacity counters before
  * the day-key shuffle), stored partials are |days| × capacity rows, and
  * a daily load sketches only its delta — same contract as the HLL path.
  * Compression sorts ≤ 2·capacity in-memory entries — driver-free,
  * codegen-adjacent cost per group, not per row.
  */
object MisraGries {

  private[graft] def compress(m: Map[String, Long],
                              capacity: Int): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      // subtract the (capacity+1)-th largest weight from every counter;
      // a VALUE is subtracted, so ties cannot make the result depend on
      // item order
      val kth = m.values.toSeq.sortBy(-_)(Ordering.Long)(capacity)
      m.collect { case (k, v) if v > kth => k -> (v - kth) }
    }

  private final class MgAggregator(capacity: Int)
      extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long],
                        in: Map[String, Long]): Map[String, Long] = merge(b, in)
    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
      compress(small.foldLeft(big) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }, capacity)
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The Misra-Gries summary as a SQL aggregate over a weighted-item map
    * column (build per-row singletons with `map(item, weight)`). */
  def mgAgg(capacity: Int, in: Column): Column = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    udaf(new MgAggregator(capacity),
      ExpressionEncoder[Map[String, Long]]()).apply(in)
  }

  /** Mergeable daily heavy-hitter partials: (day, mg map<item, weight>).
    * Items with true daily count > N_day/(capacity+1) are guaranteed
    * retained; exact when a day has ≤ capacity distinct items. */
  def dailyTopKPartial(events: DataFrame, tsCol: String, itemCol: String,
                       capacity: Int): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(mgAgg(capacity,
        map(col(itemCol).cast("string"), lit(1L))).as("mg"))

  /** Merge heavy-hitter partial frames (pointwise sum + compression —
    * the mergeable-summaries bound holds for any merge tree). */
  def mergeTopK(parts: Seq[DataFrame], capacity: Int): DataFrame = {
    require(parts.nonEmpty, "mergeTopK needs at least one partial frame")
    parts.reduce(_.unionByName(_))
      .groupBy(col("day"))
      .agg(mgAgg(capacity, col("mg")).as("mg"))
  }

  /** Read-time finish: explode each day's summary to its top-k items —
    * (day, item, weight, rank), ranked weight desc / item asc (total
    * order). `weight` is the MG lower bound (= the exact count in the
    * exactness regime). */
  def finishTopK(partials: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("day"))
      .orderBy(col("weight").desc, col("item").asc)
    partials.select(col("day"), explode(col("mg")).as(Seq("item", "weight")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
