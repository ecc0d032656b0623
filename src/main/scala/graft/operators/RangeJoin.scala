package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — the scale pattern for point-in-interval joins.
  *
  * A naive `l.ts BETWEEN r.start AND r.end` join has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin (O(|L|·|R|) comparisons and a broadcast
  * of a whole side). This operator maps both sides onto fixed-length time
  * buckets instead: a point lands in exactly one bucket, an interval
  * explodes into every bucket it overlaps, the join becomes a plain
  * bucket equi-join (hash shuffle, AQE-skew-splittable), and the exact
  * containment predicate runs only inside matched buckets. Cost:
  * |L| + Σ(interval_len / bucketLen) rows shuffled on bucket id. Pick
  * `bucketSeconds` near the typical interval length so intervals explode
  * into O(1) buckets.
  *
  * Because a point belongs to exactly one bucket, every qualifying
  * (point, interval) pair matches exactly once — no dedup needed.
  */
object RangeJoin {

  /** Join `points` rows to `intervals` rows with
    * `start <= ts <= end` (inclusive both ends). Column names of the two
    * inputs must be disjoint; all columns of both sides survive. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    // NTZ timestamps cannot cast straight to double; the timestamp hop
    // yields fractional epoch seconds (the engine's F4 pattern)
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("timestamp").cast("double") / bucketSeconds).cast("long")
    val lb = points.withColumn("__bucket", bucketOf(col(tsCol)))
    val rb = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join: pairs where
    * `lStart <= rEnd AND rStart <= lEnd` (closed intervals). Same
    * bucketing idea as [[pointInInterval]], plus the standard
    * exactly-once trick for interval pairs: both sides explode into
    * their covered buckets, and a candidate pair is kept ONLY in the
    * bucket containing `greatest(lStart, rStart)` — the overlap's first
    * bucket — so a pair overlapping many buckets still matches exactly
    * once, with no distinct over the pair stream. Column names of the
    * two inputs must be disjoint; all columns of both sides survive.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStartCol: String, lEndCol: String,
                      rStartCol: String, rEndCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("timestamp").cast("double") / bucketSeconds).cast("long")
    val lb = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(lStartCol)), bucketOf(col(lEndCol)))))
    val rb = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rStartCol)), bucketOf(col(rEndCol)))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(lStartCol), col(rStartCol))))
      .drop("__bucket")
  }
}
