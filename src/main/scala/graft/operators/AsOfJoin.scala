package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * `rightTs <= leftTs` on the same key (the time-series/point-in-time
  * join Spark has no native operator for).
  *
  * Implementation is preference-(a) from the build brief: composed from
  * built-ins, no custom planner work. Both sides are tagged and unioned,
  * then a single `last(..., ignoreNulls)` running window per key carries
  * the most recent right payload forward; left rows project it out.
  * Cost at scale: ONE shuffle of (left ∪ right) on the key — strictly
  * better than the naive range-join (a per-key sort replaces a quadratic
  * interval probe), and the same shape a dedicated SparkPlan would pick
  * (sort-merge by key+time).
  *
  * Determinism: ties are totally ordered — at equal timestamps right rows
  * sort BEFORE left rows (so a same-instant right row is visible, `<=`
  * semantics) and among themselves by `rightIdCol` (largest id wins via
  * window order, matching "latest wins").
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightIdCol: String, rightPayload: Seq[String]): DataFrame = {
    val rightCols = rightIdCol +: rightPayload
    val leftTagged = left
      .withColumn("__side", lit(1))
      .withColumns(rightCols.map(c => s"__r_$c" -> lit(null)).toMap)
    val rightTagged = right
      .select((keyCol +: tsCol +: rightCols).map(col): _*)
      .withColumn("__side", lit(0))
    val rightProjected = rightTagged.select(
      col(keyCol) +: col(tsCol) +: col("__side") +:
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    val unioned = leftTagged.select(
      (left.columns.map(col) :+ col("__side")) ++
        rightCols.map(c => col(s"__r_$c")): _*)
      .unionByName(rightProjected, allowMissingColumns = true)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col(s"__r_$rightIdCol").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** Forward as-of join — for every left row, the EARLIEST right row
    * with `rightTs >= leftTs` on the same key: "what happens next"
    * lookups (time-to-convert, next maintenance window, next price
    * revision). Mirror of [[asOf]] — the union traverses ts DESCENDING,
    * so the running `last` carries the nearest FUTURE right row; same
    * one-shuffle cost.
    *
    * Determinism: at equal timestamps the right row is visible (`>=`
    * semantics — right rows sort before left in the traversal), and
    * simultaneous right rows resolve to the SMALLEST `rightIdCol`
    * ("earliest wins", the forward mirror of asOf's largest-id rule) —
    * they traverse in id-descending order, so the running last lands on
    * the smallest. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, rightIdCol: String,
                  rightPayload: Seq[String]): DataFrame = {
    val rightCols = rightIdCol +: rightPayload
    val leftTagged = left
      .withColumn("__side", lit(1))
      .withColumns(rightCols.map(c => s"__r_$c" -> lit(null)).toMap)
    val rightTagged = right
      .select((keyCol +: tsCol +: rightCols).map(col): _*)
      .withColumn("__side", lit(0))
    val rightProjected = rightTagged.select(
      col(keyCol) +: col(tsCol) +: col("__side") +:
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val unioned = leftTagged.select(
      (left.columns.map(col) :+ col("__side")) ++
        rightCols.map(c => col(s"__r_$c")): _*)
      .unionByName(rightProjected, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("__side").asc,
        col(s"__r_$rightIdCol").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
