package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch — the frequency-sketch sibling of
  * [[MisraGries]] (MG keeps an explicit top-capacity list and is exact
  * in the capacity > distinct regime; CM is a FIXED d×w counter grid
  * whose size never depends on the item domain, answers point queries
  * for ANY item, and over-estimates by at most εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉ — Cormode & Muthukrishnan 2005).
  * The right tool when the item domain is unbounded (URLs, n-grams)
  * and a bounded-size mergeable state must answer "how often did X
  * occur" for arbitrary X.
  *
  * Determinism: row hashes are md5 of (item, hash-row index, salt) —
  * the engine's pinned portable hash (first 15 hex chars, inside
  * signed BIGINT) — so the sketch is bit-identical on every engine
  * and every run; no seed state.
  *
  * Mergeability: the grid is a pure COUNT partial — cells from any
  * corpus split sum position-wise ([[merge]]), so any fold tree
  * (streaming batches, partition partials, cross-datacenter shards)
  * reproduces the one-shot sketch exactly.
  *
  * Scale shape: [[partial]] is one map-side-combined aggregate over a
  * `depth`-way explode (cost d·rows, like the bootstrap's B-way
  * explode — bound d, typically 3-7); the grid is d·w rows of
  * metadata, broadcastable everywhere downstream.
  */
object CountMin {

  private def bucket(item: org.apache.spark.sql.Column, d: Int,
                     width: Int, salt: String) =
    pmod(conv(substring(md5(concat_ws("#",
      item.cast("string"), lit(d.toString), lit(salt))), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong)).cast("long")

  /** Sketch a corpus: (d, w, cnt) grid rows, one per NON-EMPTY cell
    * (absent cells are zero — [[estimate]] coalesces). NULL items are
    * excluded (they are not a queryable identity). */
  def partial(df: DataFrame, itemCol: String, depth: Int, width: Int,
              salt: String = ""): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("__i"))
      .withColumn("d", explode(array((0 until depth).map(i => lit(i)): _*)))
      .select(col("d"),
        (0 until depth).foldLeft(lit(0L)) { (acc, i) =>
          when(col("d") === i, bucket(col("__i"), i, width, salt))
            .otherwise(acc)
        }.as("w"))
      .groupBy(col("d"), col("w"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Position-wise sum of sketch grids (identical depth/width/salt —
    * the caller's contract; mismatched grids are meaningless). */
  def merge(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "at least one sketch required")
    frames.reduce(_ unionByName _)
      .groupBy(col("d"), col("w"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** Inner-product estimate of two sketches (same depth/width/salt):
    * `est = min_d Σ_w a[d][w]·b[d][w]` — the CM join-SIZE estimator
    * (Σ_k f_A(k)·f_B(k) is exactly the row count of an equi-join on k),
    * an upper bound that lets a planner pick broadcast vs shuffle from
    * two d·w-cell summaries without touching either table. Exact
    * integer arithmetic (decimal(38,0) dot accumulations, loud ANSI
    * past ~1e38); absent cells are zero, and a hash row with no
    * overlapping cells yields dot 0 — the d-lattice left join keeps
    * that row so the min is never taken over a silently-shrunk set.
    * Output: one row (est). */
  def innerProduct(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    val d38 = "decimal(38,0)"
    val dots = a.join(
      b.select(col("d"), col("w"), col("cnt").as("__cb")), Seq("d", "w"))
      .groupBy(col("d"))
      .agg(sum(col("cnt").cast(d38) * col("__cb")).cast(d38).cast("long")
        .as("__dot"))
    val spark = a.sparkSession
    import scala.jdk.CollectionConverters._
    val lattice = spark.createDataFrame(
      (0 until depth).map(i =>
        org.apache.spark.sql.Row(i)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.IntegerType))))
    lattice.join(dots, Seq("d"), "left")
      .agg(min(coalesce(col("__dot"), lit(0L))).cast("long").as("est"))
  }

  /** Point-query a sketch for each probe item: `est = min_d grid[d][h_d
    * (item)]` — the classic CM upper bound (`est ≥ true count`, exact
    * when no probe row collides in any hash row). The probe side is
    * item-list scale; the sketch side is d·w metadata and broadcasts.
    * Output: (item, est). */
  def estimate(sketch: DataFrame, items: DataFrame, itemCol: String,
               depth: Int, width: Int, salt: String = ""): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    val probes = items.filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("item")).distinct()
      .withColumn("d", explode(array((0 until depth).map(i => lit(i)): _*)))
      .withColumn("w",
        (0 until depth).foldLeft(lit(0L)) { (acc, i) =>
          when(col("d") === i, bucket(col("item"), i, width, salt))
            .otherwise(acc)
        })
    probes.join(broadcast(sketch), Seq("d", "w"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col("item"))
      .agg(min(col("cnt")).cast("long").as("est"))
  }
}
