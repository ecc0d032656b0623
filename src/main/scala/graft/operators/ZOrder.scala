package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two sort
  * dimensions so that range-partitioning on ONE derived key co-locates
  * rows that are close in BOTH — the standard lakehouse trick (Delta/
  * Iceberg `OPTIMIZE ZORDER BY`) for making min/max file statistics
  * prune scans on two query dimensions at once. Sorting 100 TB by
  * `(a, b)` lexicographically gives perfect pruning on `a` and none on
  * `b`; z-ordering gives ~half the bits of pruning on each — the right
  * trade when both columns appear in selective predicates.
  *
  * Everything here is plain bit arithmetic on non-negative longs
  * (shift/and/or — codegen'd, engine-portable, mirrored verbatim by the
  * DuckDB oracle); no UDF, no custom expression needed.
  */
object ZOrder {

  /** Morton z-value: the low `bitsPer` bits of `a` and `b` interleaved
    * (a's bit i at even position 2i, b's at odd 2i+1). Inputs are masked
    * to `bitsPer` bits — callers rank/bucket raw values into
    * [0, 2^bitsPer) first (the usual recipe: percentile bucket or
    * min-max scale). bitsPer ≤ 31 keeps the result in a positive long. */
  def zValue(a: Column, b: Column, bitsPer: Int): Column = {
    require(bitsPer >= 1 && bitsPer <= 31, s"bitsPer must be in [1,31], got $bitsPer")
    val terms = (0 until bitsPer).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }
    terms.reduce[Column](_ bitwiseOR _)
  }

  /** Re-layout `df` into `nFiles` z-ordered ranges: range-partition on
    * the z-value of (aCol, bCol), sort within each partition by it, and
    * return the frame ready to write (one file per partition → each
    * file's min/max footer stats cover a compact hyper-rectangle in
    * (a, b) space, so a reader filtering on EITHER column skips most
    * files). One range-exchange — the same cost as any global sort;
    * the z-value column is dropped from the output. */
  def layout(df: DataFrame, aCol: String, bCol: String, bitsPer: Int,
             nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    df.withColumn("__z", zValue(col(aCol), col(bCol), bitsPer))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
