package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (EXT surface): brute-force cosine top-k as
  * the exact baseline, and a sign-LSH bucketed variant as the scale path.
  *
  * All vector math is double-precision built-in expressions — no UDFs, no
  * driver loops. Hot paths unroll the dot product to `dim` codegen'd terms
  * ([[Similarity.dotFixed]]); the HOF forms remain for unknown dimensions.
  * At 100 TB the query set is broadcast (it is small by construction); the
  * corpus is never shuffled in the brute-force path and shuffled once by
  * bucket in the LSH path.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision (higher-order-function form; interpreted —
    * fine for casual use, hot paths use [[dotFixed]]). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ·bᵢ expanded to `dim` plain expressions — array HOF lambdas
    * evaluate interpreted (~100μs/row at dim 64), while this unrolled sum
    * stays inside whole-stage codegen. Addition order matches [[dot]]'s
    * left fold, so results are bit-identical. */
  def dotFixed(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")).reduce(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Codegen-friendly cosine for a known dimension. */
  def cosineFixed(a: Column, b: Column, dim: Int): Column =
    dotFixed(a, b, dim) / (sqrt(dotFixed(a, a, dim)) * sqrt(dotFixed(b, b, dim)))

  /** Hot-path cosine built on the codegen'd [[graft.functions.DotProduct]]
    * expression — dimension-agnostic, a single tight loop per row inside
    * whole-stage codegen, bit-identical to the HOF and unrolled forms
    * (same sequential left-to-right double accumulation). */
  def cosineNative(a: Column, b: Column): Column = {
    import graft.functions.DotProduct.dot_product
    dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))
  }

  /** Exact top-k neighbors for each query vector, by cosine, ties broken
    * by neighbor id. `queries` must be small (it is broadcast to every
    * executor; the corpus-side scan stays partition-parallel). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Sign-LSH bucket id: bit j is the sign of the fixed hyperplane
    * (e_{2j} − e_{2j+1})·v — deterministic, engine-portable, no randomness
    * needed (a fixed orthogonal family is a valid cosine-LSH). */
  def signLshBucket(vec: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(vec, 2 * j + 1).cast("double") >=
           element_at(vec, 2 * j + 2).cast("double"), lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * One shuffle of the corpus on bucket id; each bucket holds ~N/2^bits
    * vectors, so per-query work drops by the same factor. Recall is
    * tunable via `bits` (fewer bits → bigger buckets → higher recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), signLshBucket(col(vecCol), bits).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), signLshBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(q, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF-style ANN: partition the corpus into `nCells` Voronoi cells
    * around deterministic centroids (the lowest-id vectors — a stand-in
    * for trained k-means centroids, which a production pipeline would fit
    * offline and broadcast the same way), then search only the query's
    * cell (nprobe=1).
    *
    * Scale shape: centroid assignment is one broadcast-join map stage over
    * the corpus (each row scored against all `nCells` centroids, cheapest
    * wins); the per-cell search shuffles the corpus once on cell id. The
    * cell assignment is reusable — at 100 TB it is written once as a
    * `cell` column and every subsequent query skips the assignment scan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16): DataFrame = {
    val centroids = broadcast(corpus.orderBy(col(idCol).asc).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid")))

    def assign(df: DataFrame, outIdCol: String, outVecCol: String): DataFrame = {
      val scored = df.select(col(idCol).as(outIdCol), col(vecCol).as(outVecCol))
        .crossJoin(centroids)
        .withColumn("sim", cosineNative(col(outVecCol), col("centroid")))
      val w = Window.partitionBy(col(outIdCol))
        .orderBy(col("sim").desc, col("cell_id").asc)
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col(outIdCol), col(outVecCol), col("cell_id").as("cell"))
    }

    val c = assign(corpus, "neighbor_id", "cv")
    val q = broadcast(assign(queries, "query_id", "qv"))
    val scored = c.join(q, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, restricted
    * to LSH-bucket collisions (the near-dup variant of [[lshTopK]]). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bits: Int = 4): DataFrame = {
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signLshBucket(col(vecCol), bits).as("bucket"))
    val a = withB.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withB.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosineNative(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
