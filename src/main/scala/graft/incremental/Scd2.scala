package graft.incremental

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance: keep every historical
  * value of a dimension's tracked attributes as a (valid_from, valid_to]
  * version row, `valid_to IS NULL` marking the current version — the
  * standard warehouse pattern for "what did this customer's segment look
  * like when the order shipped".
  *
  * The engine has no transactional table format (NOTES.md deferral #4),
  * so the merge is RE-DERIVATION: union the existing version rows with
  * the update batch and rebuild the per-key version chain from scratch.
  * That makes the operator deterministic and idempotent (re-running a
  * batch changes nothing), naturally handles out-of-order updates
  * (history is re-sequenced, not appended), and costs one shuffle of a
  * dimension-sized frame — dimensions are 10^6-10^9 rows where facts are
  * 10^12, so rebuilding the chain per batch is the right trade until a
  * table format provides keyed point updates.
  *
  * Version semantics: rows sort per key by (valid_from, attrs) — a total
  * order; consecutive rows with identical attributes collapse (no
  * zero-change versions); `valid_to` = next version's `valid_from`.
  */
object Scd2 {

  /** Rebuild the version chain from raw (key, attrs, fromCol) rows.
    * Output: keyCol, attrCols..., valid_from, valid_to, is_current.
    * One exchange: both windows (change-lag, successor-lead) share the
    * key partitioning and sort. */
  def resequence(rows: DataFrame, keyCol: String, attrCols: Seq[String],
                 fromCol: String): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val order = (col(fromCol) +: attrCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changed = rows
      .select((keyCol +: attrCols :+ fromCol).map(col): _*)
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: first row of a key OR any tracked attribute changed
      .filter(!(col("__prev") <=> attrs))
      .drop("__prev")
    changed
      .withColumn("valid_to", lead(col(fromCol), 1).over(w))
      .withColumnRenamed(fromCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Merge an update batch (keyCol, attrCols..., tsCol) into an existing
    * SCD2 snapshot (as produced by [[resequence]]/[[merge]]): drop the
    * derived columns, union, re-derive. Idempotent; equivalent to
    * re-sequencing the full event history (proven in Scd2Spec). */
  def merge(current: DataFrame, updates: DataFrame, keyCol: String,
            attrCols: Seq[String], tsCol: String): DataFrame = {
    val base = current.select(
      (keyCol +: attrCols).map(col) :+ col("valid_from").as("__from"): _*)
    val batch = updates.select(
      (keyCol +: attrCols).map(col) :+ col(tsCol).as("__from"): _*)
    resequence(base.unionByName(batch), keyCol, attrCols, "__from")
  }
}
