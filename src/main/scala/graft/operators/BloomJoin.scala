package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter semi-join prefiltering — the runtime-filter pattern made
  * an explicit operator.
  *
  * The 100 TB problem: a fact⋉dim semi-join shuffles the ENTIRE fact
  * side on the join key even when only a sliver of it survives. Spark's
  * own `InjectRuntimeFilter` solves this automatically but only fires
  * within its thresholds (creation side under
  * `spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`,
  * plan shape restrictions); this operator is the same idea under
  * explicit control: build a Bloom filter over the dim keys (one small
  * aggregate), embed it as a foldable literal, and drop non-candidate
  * fact rows IN THE SCAN STAGE — before the exchange — so the shuffle
  * carries ~selectivity × |fact| rows instead of |fact|. The exact join
  * that follows removes the false-positive residue: the RESULT is
  * bit-identical to the plain semi-join (Bloom filters have no false
  * negatives — q161's oracle is the plain semi-join), only the plan
  * changes.
  *
  * Uses Spark's internal `BloomFilterAggregate` /
  * `BloomFilterMightContain` (the very expressions `InjectRuntimeFilter`
  * plants) over `xxhash64(key)` via [[GraftColumnBridge]] — both sides
  * codegen, so the probe stays inside the scan's WholeStageCodegen span.
  * The built filter is collected to the driver as ONE binary scalar
  * (the dim side is small by assumption — that is what makes it the
  * build side; ~1.1 MB for 1M keys at fpp 3%) and shipped as a literal,
  * the same sanctioned scalar-fetch pattern as the IVF centroid
  * literals. `BloomFilterMightContain` requires a foldable/scalar-
  * subquery bloom input, so a literal is the supported shape here.
  *
  * Null keys: `xxhash64(null)` degenerates to the seed hash, so a null
  * fact key may pass the probe; the exact equi-join drops it (null
  * never equi-matches) — semantics preserved.
  */
object BloomJoin {

  /** Build a Bloom filter over `dim`'s `keyCol` (hashed via xxhash64),
    * sized for `expectedItems` at false-positive rate `fpp`; returns the
    * serialized filter bytes. One aggregate job over the dim side. */
  def buildBloom(dim: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.select(GraftColumnBridge.column(agg).as("bloom"))
      .head.getAs[Array[Byte]]("bloom")
  }

  /** Probe predicate: true iff `key` MIGHT be in the serialized filter
    * (no false negatives; false positives at the built fpp). Foldable
    * bloom literal + xxhash64 probe — codegen end to end. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom), GraftColumnBridge.expression(xxhash64(key))))

  /** fact ⋉ dim on `keyCol` with the Bloom prefilter in the fact scan
    * stage. Result ≡ `fact.join(dim, key, "left_semi")` exactly; the
    * shuffle upstream of the join carries only probe survivors. */
  def semiJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
               expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(dim, keyCol, expectedItems, fpp)
    fact.filter(mightContain(bloom, col(keyCol)))
      .join(dim.select(col(keyCol)), Seq(keyCol), "left_semi")
  }
}
