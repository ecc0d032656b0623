package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch with theta-style SET
  * OPERATIONS — the third member of the engine's distinct-count
  * ladder: [[graft.operators.AggMerge.bitmapDistinctPartial]] is
  * exact but domain-bounded, the HLL partial family is
  * constant-space but union-only; KMV sits between — k hash values
  * per group (Bar-Yossef et al. 2002, the theta-sketch substrate of
  * Apache DataSketches) — because keeping the actual bottom-k SAMPLE
  * of the hash space is what makes INTERSECTION (and so Jaccard /
  * overlap) estimable, which no HLL can do directly.
  *
  * Determinism (the house sketch contract): the hash is a pinned md5
  * fraction in the [[graft.llmdata.Sampling.hashFraction]] family but
  * WIDENED to 60 bits — first 15 md5 hex chars as a BIGINT in
  * [0, 2⁶⁰) — so sketches, estimates, and set operations are
  * bit-identical across runs, engines, and cluster sizes, and every
  * DuckDB oracle replays them exactly. No `rand()`, ever. 60 bits,
  * not 32 (round-13 ADVICE): a distinct sketch counts distinct
  * HASHES, so at the 10⁹-ids-per-group scale this file advertises a
  * 32-bit domain loses ~5-6% to birthday collisions and saturates
  * near 2³²; DataSketches theta sketches use 64-bit hashes for the
  * same reason. 60 (not 64) keeps the value exactly representable as
  * a non-negative signed BIGINT in both engines' hex-parse paths.
  *
  * Mergeability: a KMV sketch is the bottom-k of DISTINCT hash
  * values, and bottom-k of a union is the bottom-k of the parts'
  * bottom-ks — [[merge]] is therefore exact over any fold tree
  * (partition partials, streaming batches, replays), the idempotent
  * [[graft.operators.AggMerge.mergeDistinct]] regime. Estimator:
  * with fewer than k distinct hashes the sketch IS the distinct set
  * (exact regime — the [[MisraGries]] exactness-mirror convention);
  * at capacity, `(k−1)/θ` with θ = h₍ₖ₎/2⁶⁰ (unbiased, relative
  * error ≈ 1/√(k−2)).
  *
  * Scale shape: [[sketch]] is one distinct (hash-partitioned) plus
  * one bounded-heap top-k ([[graft.operators.TopK.perKey]] — no
  * sort); everything downstream operates on ≤k-row-per-group
  * metadata-scale frames. At 10⁹ ids per group the sketch is still k
  * rows — the segment-overlap matrix a 100 TB event store cannot
  * afford to compute exactly.
  */
object Kmv {

  /** The hash domain: 2⁶⁰ as an IEEE double (exactly representable —
    * a power of two). */
  val hashDomain: Double = 1152921504606846976.0d

  /** The pinned 60-bit portable hash: first 15 md5 hex chars of the
    * key's string form, as a BIGINT in [0, 2⁶⁰). */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-group KMV sketch: the ≤k smallest DISTINCT `hash60` values
    * of `idCol`, as (groupCols…, h) rows. One distinct + one
    * bounded-heap top-k; output is ≤k rows per group. */
  def sketch(df: DataFrame, groupCols: Seq[String], idCol: String,
             k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (the estimator needs k-1), got $k")
    require(groupCols.nonEmpty, "groupCols required")
    val hashed = df.select(
      groupCols.map(col) :+ hash60(col(idCol)).as("h"): _*).distinct()
    graft.operators.TopK.perKey(hashed, groupCols, Seq(("h", true)), k)
  }

  /** Merge partial sketches — exact under any fold tree (bottom-k of
    * a union = bottom-k of the parts' bottom-ks). Parts must share
    * the [[sketch]] schema and the same k. */
  def merge(parts: Seq[DataFrame], groupCols: Seq[String],
            k: Int): DataFrame = {
    require(parts.nonEmpty, "parts required")
    val all = parts.reduce(_ unionByName _).distinct()
    graft.operators.TopK.perKey(all, groupCols, Seq(("h", true)), k)
  }

  /** Distinct-count estimate per group off a [[sketch]]:
    * `(group…, sketch_n, theta_h, distinct_est)`. Below capacity the
    * sketch saw every distinct hash — the estimate is the exact
    * sketch size (theta_h NULL: no threshold is in play); at
    * capacity `(k−1)/θ`, θ = h₍ₖ₎/2⁶⁰. The division chain is two
    * IEEE ops on exact integers — deterministic, oracle-mirrored. */
  def estimate(sk: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("sketch_n"), max(col("h")).as("__hmax"))
      .withColumn("theta_h",
        when(col("sketch_n") === k, col("__hmax")))
      .withColumn("distinct_est",
        when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("__hmax").cast("double") / lit(hashDomain))))
      .drop("__hmax")
  }

  /** Theta-sketch SET OPERATIONS between two single-set sketches
    * (column `h`, same k): one row
    * `(n_a, n_b, n_union_sketch, n_inter_theta, union_est, inter_est,
    * jaccard_est)`.
    *
    * Union sketch = bottom-k of the hash union; θ = its kth value.
    * Intersection counts the hashes BOTH sketches retain below θ —
    * every hash < θ that either set contains is present in its
    * sketch (both sketches are complete below their own thetas,
    * which are ≥ θ), so the count is an exact sample-intersection
    * and `count/θ` the theta estimator (Dasgupta et al. 2016, the
    * DataSketches union/intersect semantics). Exact regime: a union
    * sketch below capacity means BOTH inputs were below capacity
    * (a capped input alone contributes k hashes), so union and
    * intersection are exact set arithmetic. All frames here are
    * ≤k-row metadata; the scalar attach is the engine's
    * broadcast-1-row convention. */
  def setOps(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val ua = a.select(col("h")).distinct()
    val ub = b.select(col("h")).distinct()
    val unionSk = ua.unionByName(ub).distinct()
      .orderBy(col("h").asc).limit(k)
    val stats = unionSk.agg(count(lit(1)).as("n_union_sketch"),
      max(col("h")).as("__uhmax"))
    val inter = ua.join(ub, "h")
      .crossJoin(broadcast(stats.select(col("__uhmax"), col("n_union_sketch"))))
      .filter(col("n_union_sketch") < k || col("h") <= col("__uhmax"))
      .agg(count(lit(1)).as("n_inter_theta"))
    val counts = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(inter))
    val theta = col("__uhmax").cast("double") / lit(hashDomain)
    val exact = col("n_union_sketch") < k
    counts
      .withColumn("union_est",
        when(exact, col("n_union_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) / theta))
      .withColumn("inter_est",
        when(exact, col("n_inter_theta").cast("double"))
          .otherwise(col("n_inter_theta").cast("double") / theta))
      .withColumn("jaccard_est", col("inter_est") / col("union_est"))
      .select("n_a", "n_b", "n_union_sketch", "n_inter_theta",
        "union_est", "inter_est", "jaccard_est")
  }

  /** PAIRWISE overlap matrix over grouped sketches — the sketch
    * sibling of [[graft.operators.AggMerge.bitmapOverlap]] (exact,
    * domain-bounded) for segment counts × id cardinalities where
    * exact bitmaps don't fit: every unordered group pair gets
    * union / intersection / both A∖B directions / Jaccard estimates
    * from k-row sketches. `sk` is [[sketch]] output (groupCol, h).
    *
    * Mechanics per pair: the pair's union sketch is the bottom-k of
    * the two sketches' hash union; θ its kth value; intersection and
    * difference counts take only hashes ≤ θ (every such hash is
    * known to BOTH sides — each sketch is complete below its own
    * theta ≥ θ); `cnt/θ` estimates each region, the [[setOps]]
    * exact-regime rule applying when the union sketch is below
    * capacity. Cost: groups²·k rows — sketch-scale, never
    * id-scale (the point: 10³ segments × 10⁹ ids is unpayable
    * exactly, trivial here). Output one row per pair (g_a < g_b):
    * (g_a, g_b, n_union_sketch, n_inter_theta, union_est, inter_est,
    * anotb_est, bnota_est, jaccard_est). */
  def overlapMatrix(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val g = sk.select(col(groupCol)).distinct()
    val pairs = broadcast(g.select(col(groupCol).as("g_a")))
      .crossJoin(broadcast(g.select(col(groupCol).as("g_b"))))
      .filter(col("g_a") < col("g_b"))
    val sa = pairs.join(sk.select(col(groupCol).as("g_a"), col("h")),
        Seq("g_a"))
      .select(col("g_a"), col("g_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val sb = pairs.join(sk.select(col(groupCol).as("g_b"), col("h")),
        Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val flags = sa.unionByName(sb)
      .groupBy(col("g_a"), col("g_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wPair = Window.partitionBy(col("g_a"), col("g_b"))
      .orderBy(col("h").asc)
    val ranked = flags.withColumn("__rn", row_number().over(wPair))
    val st = ranked.groupBy(col("g_a"), col("g_b"))
      .agg(count(when(col("__rn") <= k, 1)).as("n_union_sketch"),
        max(when(col("__rn") <= k, col("h"))).as("__uh"))
    val exact = col("n_union_sketch") < k
    val below = exact || col("h") <= col("__uh")
    val theta = col("__uh").cast("double") / lit(hashDomain)
    def regionEst(cnt: Column): Column =
      when(exact, cnt.cast("double"))
        .otherwise(cnt.cast("double") / theta)
    ranked.join(graft.operators.Broadcasts.maybeBroadcast(st),
        Seq("g_a", "g_b"))
      .groupBy(col("g_a"), col("g_b"), col("n_union_sketch"), col("__uh"))
      .agg(
        count(when(below && col("in_a") === 1 && col("in_b") === 1, 1))
          .as("n_inter_theta"),
        count(when(below && col("in_a") === 1 && col("in_b") === 0, 1))
          .as("__n_anotb"),
        count(when(below && col("in_a") === 0 && col("in_b") === 1, 1))
          .as("__n_bnota"))
      .withColumn("union_est",
        when(exact, col("n_union_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) / theta))
      .withColumn("inter_est", regionEst(col("n_inter_theta")))
      .withColumn("anotb_est", regionEst(col("__n_anotb")))
      .withColumn("bnota_est", regionEst(col("__n_bnota")))
      .withColumn("jaccard_est", col("inter_est") / col("union_est"))
      .select("g_a", "g_b", "n_union_sketch", "n_inter_theta",
        "union_est", "inter_est", "anotb_est", "bnota_est",
        "jaccard_est")
  }
}
