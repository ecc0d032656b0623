package graft

import org.apache.spark.sql.functions._

/** Optimization-round-15 pins: the operator internals that changed for
  * performance keep their exact semantics.
  *
  *  - editDistancePairs moved from a {b−1, b, b+1} probe explode to
  *    probe-up-only {b, b+1} with least/greatest id canonicalization —
  *    the new risk surface is a cross-bucket pair whose LOWER-bucket
  *    side has the HIGHER id (found via the bucket rule, not the id
  *    rule), pinned here.
  *  - finishQuantiles moved from one filter+agg+union branch per
  *    quantile to a single conditional-aggregation pass + stack — the
  *    preserved edge is the empty-input shape (one null row PER
  *    requested quantile, not an empty frame).
  */
class Round15OptSpec extends SparkSpec {
  import spark.implicits._

  test("editDistancePairs cross-bucket pair with inverted id order " +
    "is found exactly once, ids canonicalized") {
    // lengths 33 and 31 land in buckets 1 and 0 (width 32); the
    // LOWER-bucket doc carries the HIGHER id, so only the bucket rule
    // (lower bucket probes up) can find the pair — and id_a < id_b
    // must still hold in the output.
    val docs = Seq(1L -> ("a" * 33), 2L -> ("a" * 31))
      .toDF("doc_id", "text")
    val rows = graft.llmdata.DedupOps.editDistancePairs(docs, "doc_id",
      "text", maxDist = 5, bucketWidth = 32).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 2L, 2L)), s"got ${rows.mkString(",")}")
  }

  test("editDistancePairs equals brute-force thresholded levenshtein " +
    "on a mixed-bucket corpus") {
    val docs = Seq(
      1L -> ("x" * 30),        // bucket 0
      2L -> ("x" * 34),        // bucket 1, dist 4 to 1 (id inverted vs 3)
      3L -> ("x" * 33),        // bucket 1, dist 3 to 1
      4L -> ("x" * 63),        // bucket 1
      5L -> ("x" * 65),        // bucket 2, dist 2 to 4
      6L -> "totally unrelated words here"
    ).toDF("doc_id", "text")
    val got = graft.llmdata.DedupOps.editDistancePairs(docs, "doc_id",
        "text", maxDist = 5, bucketWidth = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val brute = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("ed", levenshtein(col("a.text"), col("b.text"), 5))
      .filter(col("ed") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(4).toLong).toMap
    assert(got == brute, s"got $got expected $brute")
  }

  test("finishQuantiles on empty partials yields one null row per " +
    "requested quantile") {
    import graft.operators.AggMerge
    val empty = Seq.empty[(java.sql.Date, Long, Long)]
      .toDF("day", "cents", "cnt")
    val out = AggMerge.finishQuantiles(empty, Seq((1, 2), (9, 10)))
      .collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 2L), (9L, 10L)))
    assert(out.forall(r => r.isNullAt(2) && r.isNullAt(3)),
      "value_cents and n_rows must be NULL on an empty lattice")
  }
}
