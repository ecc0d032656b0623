package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter as a mergeable 64-bit-word table — the MEMBERSHIP
  * sketch beside [[CountMin]]'s frequency grid: a fixed `mBits` bit
  * array (stored as `mBits/64` (word_idx, bits) rows, absent words are
  * zero) answering "might item X be in the set?" with no false
  * negatives and a tunable false-positive rate
  * `(1 − e^(−k·n/m))^k` — the corpus-scale dedup/decontamination
  * prefilter when the member set is too large to broadcast as keys
  * but its BITS fit anywhere (Bloom 1970; the same contract as
  * [[graft.operators.BloomJoin]], which delegates to Spark's internal
  * filter — this one is an explicit, engine-portable table the
  * streaming sink can persist and merge).
  *
  * Determinism: bit positions are md5 of (item, hash index, salt) —
  * the engine's pinned portable hash (first 15 hex chars inside
  * signed BIGINT, pmod to mBits), so the filter is bit-identical on
  * every engine and every run.
  *
  * Mergeability: the word table is a pure bitwise-OR partial — OR is
  * associative, commutative, and IDEMPOTENT, so any fold tree
  * (streaming batches, partition partials, replayed batches) yields
  * the identical filter with NO batch-id fence — the
  * [[graft.operators.AggMerge.mergeDistinct]] HLL regime, not the
  * fenced COUNT regime.
  *
  * Scale shape: [[partial]] is one map-side-combined aggregate over a
  * k-way explode (bound k, typically 3-7); the filter is ≤ mBits/64
  * rows of metadata, broadcastable into any probe join.
  */
object Bloom {

  private[graft] def position(item: Column, i: Int, mBits: Long,
                       salt: String): Column =
    pmod(conv(substring(md5(concat_ws("#",
      item.cast("string"), lit(i.toString), lit(salt))), 1, 15), 16, 10)
      .cast("long"), lit(mBits)).cast("long")

  private[graft] def checkParams(mBits: Long, k: Int): Unit = {
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
  }

  /** Build a filter over a corpus: (word_idx, bits) rows, one per
    * non-empty 64-bit word. NULL items are excluded (not a queryable
    * identity). */
  def partial(df: DataFrame, itemCol: String, mBits: Long, k: Int,
              salt: String = ""): DataFrame = {
    checkParams(mBits, k)
    df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("__i"))
      .withColumn("h", explode(array((0 until k).map(i => lit(i)): _*)))
      .withColumn("__p",
        (0 until k).foldLeft(lit(0L)) { (acc, i) =>
          when(col("h") === i, position(col("__i"), i, mBits, salt))
            .otherwise(acc)
        })
      .select(expr("__p div 64").as("word_idx"),
        expr("shiftleft(1L, cast(__p % 64 as int))").as("__m"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(__m)").cast("long").as("bits"))
  }

  /** Bitwise-OR of filters (identical mBits/k/salt — the caller's
    * contract). Idempotent: merging a filter with itself, or replaying
    * a batch, changes nothing. */
  def merge(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "at least one filter required")
    frames.reduce(_ unionByName _)
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(bits)").cast("long").as("bits"))
  }

  /** Probe the filter: (item, might_contain) per distinct probe item —
    * true iff EVERY one of the item's k bits is set (missing word rows
    * are zero). No false negatives by construction; a true answer is
    * "present or a hash collision". The filter side is word-count
    * metadata and broadcasts into the probe join. */
  def contains(filter: DataFrame, probes: DataFrame, itemCol: String,
               mBits: Long, k: Int, salt: String = ""): DataFrame = {
    checkParams(mBits, k)
    val p = probes.filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("item")).distinct()
      .withColumn("h", explode(array((0 until k).map(i => lit(i)): _*)))
      .withColumn("__p",
        (0 until k).foldLeft(lit(0L)) { (acc, i) =>
          when(col("h") === i, position(col("item"), i, mBits, salt))
            .otherwise(acc)
        })
      .withColumn("word_idx", expr("__p div 64"))
      .withColumn("__m", expr("shiftleft(1L, cast(__p % 64 as int))"))
    p.join(graft.operators.Broadcasts.maybeBroadcast(filter),
        Seq("word_idx"), "left")
      .groupBy(col("item"))
      .agg(min(when(coalesce(col("bits"), lit(0L))
        .bitwiseAND(col("__m")) === col("__m"), 1L).otherwise(0L))
        .as("__all"))
      .select(col("item"), (col("__all") === 1L).as("might_contain"))
  }
}
