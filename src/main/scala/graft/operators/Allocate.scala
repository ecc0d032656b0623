package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact proportional allocation (proration): distribute a header
  * amount across its lines by weight so the shares SUM BACK EXACTLY —
  * the invoice-tax / freight / discount spreading step of every billing
  * and cost-accounting pipeline, where naive `total * w/W` doubles
  * leave cents appearing or vanishing in reconciliation.
  *
  * The attribution micro-credit discipline (q197) generalized: amounts
  * scale to exact integer micro-units, each line takes
  * `(total_micro · w_micro) div W_micro` (floor), and the remainder —
  * at most lines−1 micro-units — lands on ONE deterministic line (the
  * largest weight, ties → largest line id), so Σ allocated ≡ total in
  * any engine at any parallelism. Zero-total-weight groups fall back to
  * equal split by line count under the same remainder rule. Products
  * ride decimal(38,0) (micro×micro exceeds BIGINT); the integral
  * divide returns exact longs.
  *
  * Shape at 100 TB: one per-key weight aggregate joined back
  * (broadcast under the gate), one map-side share projection, one
  * per-key window for the remainder line — all on the natural (key)
  * partitioning. */
object Allocate {

  /** @param lines   line rows
    * @param headers  (keyCol, totalCol) one row per key — keys missing
    *                 here allocate nothing (lines drop); keys with no
    *                 lines contribute nothing
    * @param keyCol   join key
    * @param lineIdCol line identity (remainder tie-break)
    * @param weightCol non-negative weights (NULL = 0)
    * @return lines' key + id + weight with `allocated_micro` (BIGINT)
    *         and `allocated` (micro/1e6, exact double scaling) */
  def prorate(lines: DataFrame, headers: DataFrame, keyCol: String,
              lineIdCol: String, weightCol: String,
              totalCol: String): DataFrame = {
    val M = 1000000L
    val d38 = "decimal(38,0)"
    val l = lines.select(col(keyCol), col(lineIdCol),
      coalesce(col(weightCol), lit(0)).cast("decimal(20,6)").as("__w"))
      .withColumn("__wm", (col("__w") * M).cast("long"))
    val h = headers.select(col(keyCol),
      (col(totalCol).cast("decimal(20,6)") * M).cast("long").as("__tm"))
    val wsum = l.groupBy(col(keyCol))
      .agg(sum(col("__wm")).as("__wsum"), count(lit(1)).as("__n"))
    val eff = l
      .join(Broadcasts.maybeBroadcast(wsum), Seq(keyCol))
      .join(Broadcasts.maybeBroadcast(h), Seq(keyCol))
      // zero-weight groups: equal split (weight 1 each, W = n)
      .withColumn("__ew", when(col("__wsum") > 0, col("__wm")).otherwise(lit(1L)))
      .withColumn("__edenom", when(col("__wsum") > 0, col("__wsum")).otherwise(col("__n")))
      .withColumn("__share",
        expr(s"CAST(CAST(__tm AS $d38) * CAST(__ew AS $d38) AS $d38) div __edenom"))
    val wRem = Window.partitionBy(col(keyCol))
      .orderBy(col("__ew").desc, col(lineIdCol).desc)
    val wAll = Window.partitionBy(col(keyCol))
    eff
      .withColumn("__rk", row_number().over(wRem))
      .withColumn("__rem", col("__tm") - sum(col("__share")).over(wAll))
      .withColumn("allocated_micro",
        col("__share") + when(col("__rk") === 1, col("__rem")).otherwise(lit(0L)))
      .select(col(keyCol), col(lineIdCol),
        col("__w").cast("double").as("weight"),
        col("allocated_micro"),
        (col("allocated_micro").cast("double") / M).as("allocated"))
  }

  /** Guarded per-side cumulative [lo, hi) intervals both FIFO
    * operators share (qty > 0 and unique-seq raises live here). */
  private def cumifiedFifo(df: DataFrame, keyCol: String, seqCol: String,
                           qtyCol: String, tag: String): DataFrame = {
      val wDup = Window.partitionBy(col(keyCol), col(seqCol))
      val wCum = Window.partitionBy(col(keyCol))
        .orderBy(col(seqCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df
        .withColumn("__q",
          when(col(qtyCol).isNull || col(qtyCol) <= 0,
            raise_error(concat(lit(s"fifoMatch: $tag qty must be > 0" +
              " at ("), col(keyCol).cast("string"), lit(", "),
              col(seqCol).cast("string"), lit(")"))))
            .otherwise(col(qtyCol).cast("long")))
        .withColumn("__q",
          when(count(lit(1)).over(wDup) > 1,
            raise_error(concat(lit(s"fifoMatch: duplicate $tag seq" +
              " at ("), col(keyCol).cast("string"), lit(", "),
              col(seqCol).cast("string"), lit(")"))))
            .otherwise(col("__q")))
        .withColumn("__hi", sum(col("__q")).over(wCum))
        .withColumn("__lo", col("__hi") - col("__q"))
        .select(col(keyCol), col(seqCol).as(s"${tag}_seq"),
          col("__lo").as(s"__${tag}_lo"), col("__hi").as(s"__${tag}_hi"))
  }

  /** FIFO lot matching WITHOUT iteration — the cost-basis /
    * inventory-consumption classic (match each demand against supply
    * lots oldest-first) recast as interval intersection: in FIFO
    * order, lot i owns the quantity interval
    * `[cumSupply_{i−1}, cumSupply_i)` and demand j consumes
    * `[cumDemand_{j−1}, cumDemand_j)`; the quantity FIFO assigns pair
    * (i, j) is exactly the OVERLAP of those intervals. Two per-key
    * running-sum windows + one equi-join on the key with the overlap
    * predicate — no loop, no recursion, bit-exact integers.
    *
    * Contract: quantities must be > 0 (raise — a zero/negative lot
    * has no FIFO meaning) and `seqCol` unique per key on each side
    * (raise — ties have no order). The join is BANDED
    * ([[RangeJoin.pointInInterval]]'s bucket trick over the
    * cumulative axis): both sides explode their intervals onto a
    * per-key bucket grid (width ≈ one average interval, so ~2 rows
    * per interval), pairs meet on a (key, bucket) EQUI-join, and each
    * overlapping pair is counted once at its canonical bucket
    * (`max(lo_s, lo_d) div B`). Since FIFO intervals tile the axis
    * without overlap, true pairs number ≤ lots + demands − 1 per key
    * — the banding makes candidate generation the same order instead
    * of lots×demands (the naive form was the round's top bench cost
    * at 12.9 s; banded it is sub-second).
    *
    * Output: (key, supply_seq, demand_seq, matched_qty > 0), plus the
    * per-pair interval edges for audit. Unmatched supply tail /
    * demand overhang simply produce no pairs past the shorter
    * cumulative axis. */
  def fifoMatch(supply: DataFrame, demand: DataFrame, keyCol: String,
                seqCol: String, qtyCol: String): DataFrame = {
    val s = cumifiedFifo(supply, keyCol, seqCol, qtyCol, "supply")
    val d = cumifiedFifo(demand, keyCol, seqCol, qtyCol, "demand")
    // per-key bucket width ≈ one average interval: each side explodes
    // into ~(n_s + n_d) bucket rows total, keeping the equi-join
    // candidate set linear in the interval counts
    val stats = s.groupBy(col(keyCol))
      .agg(max(col("__supply_hi")).as("__st"),
        count(lit(1)).as("__ns"))
      .join(d.groupBy(col(keyCol))
        .agg(max(col("__demand_hi")).as("__dt"),
          count(lit(1)).as("__nd")), Seq(keyCol))
      .withColumn("__b",
        greatest(lit(1L), expr(
          "greatest(__st, __dt) div (__ns + __nd)") + 1L))
      .select(col(keyCol), col("__b"))
    def banded(df: DataFrame, lo: String, hi: String): DataFrame =
      df.join(Broadcasts.maybeBroadcast(stats), Seq(keyCol))
        .withColumn("__bkt", explode(sequence(
          expr(s"$lo div __b"), expr(s"($hi - 1) div __b"))))
    banded(s, "__supply_lo", "__supply_hi")
      .join(banded(d, "__demand_lo", "__demand_hi")
        .drop("__b"), Seq(keyCol, "__bkt"))
      .filter(col("__supply_hi") > col("__demand_lo")
        && col("__demand_hi") > col("__supply_lo")
        // canonical bucket: count each overlapping pair exactly once
        && col("__bkt") === expr(
          "greatest(__supply_lo, __demand_lo) div __b"))
      .select(col(keyCol), col("supply_seq"), col("demand_seq"),
        (least(col("__supply_hi"), col("__demand_hi"))
          - greatest(col("__supply_lo"), col("__demand_lo")))
          .as("matched_qty"),
        col("__supply_lo").as("supply_from"),
        col("__demand_lo").as("demand_from"))
  }

  /** [[fifoMatch]]'s complement — the REMAINING inventory per lot
    * after FIFO consumption: with total demand D per key, lot i
    * (interval [lo, hi)) keeps `max(0, hi − max(lo, D))`. Same
    * cumulative construction, no pair join at all (only the demand
    * TOTAL matters for what's left). Output: (key, supply_seq,
    * lot_qty, remaining_qty) — every lot emits, consumed lots with
    * remaining 0; the aging report is a filter away. Conservation:
    * Σ remaining = max(0, S − D) per key (the q476 require). */
  def fifoRemaining(supply: DataFrame, demand: DataFrame, keyCol: String,
                    seqCol: String, qtyCol: String): DataFrame = {
    val s = cumifiedFifo(supply, keyCol, seqCol, qtyCol, "supply")
    val totals = cumifiedFifo(demand, keyCol, seqCol, qtyCol, "demand")
      .groupBy(col(keyCol)).agg(max(col("__demand_hi")).as("__dtot"))
    s.join(Broadcasts.maybeBroadcast(totals), Seq(keyCol), "left")
      .withColumn("__d", coalesce(col("__dtot"), lit(0L)))
      .select(col(keyCol), col("supply_seq"),
        (col("__supply_hi") - col("__supply_lo")).as("lot_qty"),
        greatest(lit(0L), col("__supply_hi")
          - greatest(col("__supply_lo"), col("__d")))
          .as("remaining_qty"))
  }

  /** Largest-remainder (Hamilton) apportionment: per group, split an
    * integer `total` of indivisible units (sampling slots, shard
    * counts, seats) across members proportionally to weight so the
    * units SUM BACK EXACTLY — [[prorate]]'s sibling for WHOLE units
    * (prorate spreads a divisible amount; here each member gets
    * `⌊total·w/W⌋` and the `total − Σ⌊⌋` leftover units go ONE EACH
    * to the largest fractional remainders, ties → smallest member id
    * — the canonical quota method, every step exact integer
    * arithmetic on decimal(38,0) products). The training-mix use:
    * turning fractional corpus proportions into an exact
    * whole-document sampling budget. NULL/negative weights raise
    * (an apportionment over them has no meaning); an all-zero-weight
    * group raises (no quota exists — choose an explicit equal-split
    * upstream if that's the intent). Per-group windows on the
    * member-cardinality frame — group-scale, never row-scale.
    * Output: (groupCols…, member, weight, base_units, extra_unit,
    * units). */
  def largestRemainder(df: DataFrame, groupCols: Seq[String],
                       memberCol: String, weightCol: String,
                       total: Long): DataFrame = {
    require(groupCols.nonEmpty, "groupCols required")
    require(total >= 0, s"total must be >= 0, got $total")
    val d38 = "decimal(38,0)"
    val w = col(weightCol).cast("decimal(12,2)")
    val base = df
      .withColumn("__w",
        when(col(weightCol).isNull || w < 0, raise_error(lit(
          "largestRemainder: NULL or negative weight — apportionment " +
            "needs non-negative weights")))
          .otherwise((w * 100).cast("long")))
      .groupBy(groupCols.map(col) :+ col(memberCol).as("member"): _*)
      .agg(sum(col("__w")).cast("long").as("weight"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val quoted = base
      .withColumn("__tw", sum(col("weight")).over(wAll).cast("long"))
      .withColumn("__tw",
        when(col("__tw") <= 0, raise_error(lit(
          "largestRemainder: zero total weight in a group — no quota " +
            "exists; equal-split explicitly upstream if intended")))
          .otherwise(col("__tw")))
      // floor() on the decimal quotient — a bare decimal->decimal cast
      // would ROUND (HALF_UP), not floor; quotient scale (>=21 digits)
      // cannot round across an integer boundary at these magnitudes
      .withColumn("base_units",
        floor(lit(total).cast(d38) * col("weight") / col("__tw"))
          .cast("long"))
      .withColumn("__rem",
        (lit(total).cast(d38) * col("weight")).cast(d38).cast("long")
          - col("base_units") * col("__tw"))
    quoted
      .withColumn("__leftover",
        lit(total) - sum(col("base_units")).over(wAll).cast("long"))
      .withColumn("__rk",
        row_number().over(wAll.orderBy(col("__rem").desc,
          col("member").asc)).cast("long"))
      .withColumn("extra_unit", (col("__rk") <= col("__leftover"))
        .cast("int"))
      .withColumn("units", col("base_units") + col("extra_unit"))
      .select(groupCols.map(col) :+ col("member") :+ col("weight") :+
        col("base_units") :+ col("extra_unit") :+ col("units"): _*)
  }
}
