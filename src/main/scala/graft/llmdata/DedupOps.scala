package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (EXT surface):
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup.
  *
  * Scale design (100 TB): every stage is a map or a key-shuffle — no
  * driver collects, no cross joins. MinHash/LSH turns the quadratic
  * all-pairs problem into a band-bucket equi-join; SimHash into a bucket
  * groupBy. All hash functions are md5-derived (built-in, codegen'd,
  * engine-portable — no JVM hashCode or murmur seeds leak into results).
  */
object DedupOps {

  /** Exact dedup on a canonical fingerprint: one hash-shuffle groupBy.
    * Returns (fingerprint, keeper_id, dup_count) — keeper = min id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Word n-gram shingles of `textCol` (distinct, sorted for set
    * semantics). Empty/short docs yield an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_sort(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))))
  }

  /** One MinHash value: min over shingles of a salted md5, kept as a
    * 16-hex-char string (fixed-width lowercase hex ⇒ lexicographic min ==
    * numeric min; portable to any engine with md5+substr). */
  private def minhash(sh: Column, salt: Int): Column =
    array_min(transform(sh, s => substring(md5(concat(s, lit(s"#$salt"))), 1, 16)))

  /** MinHash signature of `numHashes` values. */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column =
    array((0 until numHashes).map(i => minhash(shingles(text, shingleSize), i)): _*)

  /** Signature computed from an already-materialized shingle column —
    * avoids re-shingling the text once per hash function. */
  private def signatureFromShingles(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i => minhash(sh, i)): _*)

  /** MinHash+LSH candidate pairs: band the signature (`bands` bands of
    * `rows` hashes), bucket-join on (band_index, band_hash), emit each
    * candidate pair once with its estimated and exact Jaccard.
    *
    * Cost at scale: |docs| × bands rows shuffled on band_hash; pairs only
    * materialize within buckets (collision probability ≈ s^rows per band,
    * the classic S-curve — Broder 1997; Leskovec/Rajaraman/Ullman ch.3). */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3, bands: Int = 4, rows: Int = 2,
                 jaccardThreshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rows
    // Stage 1: shingle once per doc; keep the array out of every shuffle.
    val shingled = df.select(col(idCol).as("doc_id"),
      shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)

    // Stage 2: band keys only (doc_id, band, band_hash) — tiny rows, so the
    // band-bucket shuffle moves ids + hashes, never document payloads.
    val banded = shingled
      .select(col("doc_id"), signatureFromShingles(col("sh"), numHashes).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws("|", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")

    // Stage 3: candidate pairs, deduped across bands BEFORE the expensive
    // exact-Jaccard verification (a pair colliding in 3 bands verifies once).
    val candidates = banded.as("a").join(banded.as("b"), Seq("band", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    // Stage 4: fetch shingles by id and verify exactly.
    val shA = shingled.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val shB = shingled.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** N-gram Jaccard similarity for an explicit candidate pair set
    * (exact verification path; used standalone on pre-blocked pairs). */
  def jaccard(shA: Column, shB: Column): Column =
    when(size(array_union(shA, shB)) === 0, 0.0).otherwise(
      size(array_intersect(shA, shB)).cast("double") / size(array_union(shA, shB)))

  /** 32-bit SimHash fingerprint (Charikar 2002): per-token md5-derived
    * 32-bit hash; fingerprint bit b is the sign of Σ_tokens (±1 by token
    * bit b). Explode→groupBy keeps it one shuffle on the doc id; the 32
    * per-bit sums are plain aggregate expressions (codegen'd). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map(bit =>
      sum(shiftright(col("h"), bit).bitwiseAND(1) * 2 - 1).as(s"b$bit"))
    val fp = (0 until 32).map(bit =>
      when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(0L)).reduce(_ + _)
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance `maxHamming`, blocked
    * on the high 16 bits (docs differing only in low bits collide; a
    * production variant uses multiple bit-permutation tables). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = simhash(df, idCol, textCol)
    val block = shiftright(col("simhash"), 16)
    val a = fp.select(block.as("blk"), col("doc_id").as("id_a"), col("simhash").as("fp_a"))
    val b = fp.select(block.as("blk"), col("doc_id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
