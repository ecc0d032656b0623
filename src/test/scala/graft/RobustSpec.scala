package graft

import org.apache.spark.sql.functions._
import graft.operators.Robust

/** Robust-statistics operators: winsorize clamp and the median/MAD
  * outlier gate — including the breakdown-point property that motivates
  * MAD over mean/stddev. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clamps to the exact percentile interval, NULLs pass") {
    val df = (Seq.tabulate(9)(i => Some((i + 1).toDouble * 10)) :+ None)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Robust.winsorize(df, "v", 0.25, 0.75)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // percentiles over 10..90: p25 = 30, p75 = 70 (linear interp on 9 vals)
    assert(out(0L).contains(30.0) && out(4L).contains(50.0)
      && out(8L).contains(70.0))
    assert(out(9L).isEmpty, "NULL passes through unclamped")
  }

  test("madOutliers flags corrupt rows without letting them move the gate") {
    // 10 sane lengths around 100 plus two wild corruptions: the median
    // and MAD are computed FROM the corrupted frame yet stay at the sane
    // values — the breakdown property a mean/stddev z-score lacks
    val vals = (0 until 10).map(i => (i.toLong, 100L + i)) ++
      Seq((10L, 1000000L), (11L, -1000000L))
    val out = Robust.madOutliers(vals.toDF("id", "v"), "v", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("median") == 104L, "lower median of 12 values")
    assert(out(0L).getAs[Long]("mad") == 3L, "lower median of the devs")
    assert((0 until 10).forall(i => !out(i.toLong).getAs[Boolean]("is_outlier")))
    assert(out(10L).getAs[Boolean]("is_outlier")
      && out(11L).getAs[Boolean]("is_outlier"))
  }

  test("madOutliers boundary is exact: dev == k*MAD is NOT an outlier") {
    // values 0,10,20: median 10, devs {10,0,10} → MAD 10; k=1 → the
    // threshold is strict >, so dev exactly 10 stays inside
    val out = Robust.madOutliers(
      Seq((1L, 0L), (2L, 10L), (3L, 20L)).toDF("id", "v"), "v", k = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_outlier")).toMap
    assert(out.values.forall(_ == false))
  }

  test("madOutliers: NULL values are never flagged") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(6L)))
      .toDF("id", "v")
    val out = Robust.madOutliers(df, "v", k = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_outlier")).toMap
    assert(!out(2L), "NULL value coalesces to not-outlier")
  }

  test("normalizeByGroup computes the exact-moment z-score per group") {
    // group a: values 1,2,3 → n=3, S=6, Sxx=14, radicand = 3·14−36 = 6
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", Some(2.0)), (3L, "a", Some(3.0)),
      (4L, "b", Some(7.0)), (5L, "b", Some(7.0)),  // constant group
      (6L, "c", Some(9.0)),                        // singleton group
      (7L, "a", None)                              // NULL value
    ).toDF("id", "g", "v")
    val out = Robust.normalizeByGroup(df, Seq("g"), "v")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("v_z"))).toMap
    assert(out(1L) == Some(-3.0 / math.sqrt(6.0)))
    assert(out(2L) == Some(0.0))
    assert(out(3L) == Some(3.0 / math.sqrt(6.0)))
    assert(out(4L).isEmpty && out(5L).isEmpty, "constant group has no z")
    assert(out(6L).isEmpty, "singleton group has no z")
    assert(out(7L).isEmpty, "NULL value normalizes to NULL")
    // NULL row is excluded from group a's moments: z(2) is exactly 0
  }
}
