package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage (entity resolution across two tables) — the
  * classic Fellegi-Sunter shape with deterministic integer scoring:
  * blocking keys cut the cross product to within-block candidates, a
  * field-agreement score ranks each candidate pair, and fixed
  * thresholds tier pairs into match / possible. The LLM-data cousin of
  * the document near-dup family: dedup joins documents to documents by
  * content; linkage joins ENTITY rows (customers, suppliers, users)
  * across sources by field evidence.
  *
  * Scale design (100 TB): candidates come ONLY from the blocking
  * equi-join — one shuffle on the block key, never an all-pairs cross
  * product (the same discipline PruningSpec enforces on the dedup
  * family). Block selectivity is the caller's lever: a block key that
  * keeps the biggest block in the thousands bounds per-task work
  * regardless of table size; composite blocks (e.g. region + name
  * prefix) or multi-pass blocking handle skew. Scoring is a map-side
  * projection over candidate pairs.
  *
  * Determinism: scores are INTEGER sums of per-field agreement points
  * (exact in any engine — the oracle gate hashes them); no libm, no
  * doubles. Levenshtein is Spark's builtin (same definition as
  * DuckDB's `levenshtein`).
  */
object Linkage {

  /** Agreement points from string edit distance: `max(0, w - lev(l,r))`
    * — full weight on exact match, linear falloff per edit, floor 0.
    * NULL on either side scores 0 (no evidence, not negative
    * evidence). */
  def levenshteinPoints(l: Column, r: Column, weight: Int): Column =
    when(l.isNull || r.isNull, lit(0))
      .otherwise(greatest(lit(0), lit(weight) - levenshtein(l, r)))

  /** Agreement points from exact equality (the null-safe kind: NULL on
    * either side is "no evidence" → 0, not a match). */
  def equalityPoints(l: Column, r: Column, weight: Int): Column =
    when(l.isNull || r.isNull, lit(0))
      .otherwise(when(l === r, lit(weight)).otherwise(lit(0)))

  /** Link `left` (aliased `l`) to `right` (aliased `r`).
    *
    * @param blockOn   (leftCol, rightCol) equi-join blocking keys —
    *                  candidates ONLY form within a block
    * @param score     integer scoring expression over `l.`/`r.` columns
    *                  (compose [[levenshteinPoints]]/[[equalityPoints]])
    * @param select    output columns (over `l.`/`r.` refs), e.g. the two
    *                  ids — `score` and `tier` are appended
    * @param matchAt   score ≥ matchAt → tier "match"
    * @param possibleAt score in [possibleAt, matchAt) → tier
    *                  "possible"; below → pair dropped
    * @param extraPred additional candidate predicate (e.g. `l.id <
    *                  r.id` for self-dedup linkage)
    */
  def linkRecords(left: DataFrame, right: DataFrame,
      blockOn: Seq[(String, String)], score: Column,
      select: Seq[Column], matchAt: Int, possibleAt: Int,
      extraPred: Column = lit(true)): DataFrame = {
    require(possibleAt <= matchAt, "possibleAt must be <= matchAt")
    require(blockOn.nonEmpty, "blocking keys required — unblocked linkage is a cross product")
    val joinCond = blockOn.map { case (lc, rc) =>
      col(s"l.$lc") === col(s"r.$rc") }.reduce(_ && _) && extraPred
    left.alias("l").join(right.alias("r"), joinCond)
      .withColumn("score", score)
      .filter(col("score") >= possibleAt)
      .withColumn("tier",
        when(col("score") >= matchAt, lit("match")).otherwise(lit("possible")))
      .select(select :+ col("score") :+ col("tier"): _*)
  }

  /** One-best assignment on top of [[linkRecords]] output: keep each
    * left id's highest-scoring pair (ties → smallest right id) — turns
    * the pair list into a usable crosswalk. Window is partitioned by
    * the left id: no global sort. */
  def bestMatchPerLeft(pairs: DataFrame, leftId: String, rightId: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(leftId))
      .orderBy(col("score").desc, col(rightId).asc)
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Golden-record survivorship: collapse matched-entity clusters into
    * one canonical row each — the step AFTER [[linkRecords]] that a
    * master-data pipeline actually ships. Match pairs become an
    * undirected graph; [[graft.operators.Graph.connectedComponents]]
    * assigns every entity its transitive cluster (a→b, b→c ⇒ {a,b,c}
    * even though a–c never scored); unmatched records stay singleton
    * clusters of themselves; then one per-cluster aggregate applies the
    * survivorship rules field by field.
    *
    * Rules (all engine-deterministic, ties included):
    *  - `longestOf`: the longest non-NULL string, ties → the
    *    lexicographically GREATEST (via max over (length, value)
    *    structs — one aggregate, no window);
    *  - `maxOf` / `minOf`: plain extremes (NULLs ignored by max/min).
    *
    * Output: (cluster_id, n_members, <rule columns in declaration
    * order>). Shape at 100 TB: component propagation is the
    * [[Graph.connectedComponents]] contract (pairs-scale, diameter
    * rounds); the cluster assignment is one left join (match pairs are
    * usually a small fraction of records — the join broadcasts when
    * they are); survivorship is ONE hash aggregate with map-side
    * combine. */
  def goldenRecord(records: DataFrame, idCol: String, matchPairs: DataFrame,
      leftIdCol: String, rightIdCol: String,
      longestOf: Seq[String] = Nil, maxOf: Seq[String] = Nil,
      minOf: Seq[String] = Nil): DataFrame = {
    require(longestOf.nonEmpty || maxOf.nonEmpty || minOf.nonEmpty,
      "at least one survivorship rule column required")
    val comp = graft.operators.Graph.connectedComponents(
      matchPairs.select(col(leftIdCol), col(rightIdCol)),
      leftIdCol, rightIdCol)
    val assigned = records
      .join(comp, records(idCol) === comp("node_id"), "left")
      .withColumn("cluster_id", coalesce(col("component_id"), col(idCol)))
    val aggs =
      Seq(count(lit(1)).as("n_members")) ++
      longestOf.map(c =>
        max(when(col(c).isNotNull,
          struct(length(col(c)).as("l"), col(c).as("v"))))
          .getField("v").as(c)) ++
      maxOf.map(c => max(col(c)).as(c)) ++
      minOf.map(c => min(col(c)).as(c))
    assigned.groupBy(col("cluster_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Categorical canonicalization: collapse near-duplicate category
    * strings ("RETAIL", "RETAIl", "RETAI") onto their most frequent
    * neighbor — the dimension-cleanup pass before any groupBy on a
    * hand-entered column. Each DISTINCT value maps to the candidate
    * within Levenshtein ≤ `maxDist` (itself included) with the
    * HIGHEST count, ties to the lexicographically smallest value — a
    * deterministic single-hop argmax, not transitive closure (a chain
    * a~b~c with lev(a,c) > maxDist keeps a and c apart; run the
    * mapping to fixpoint or use goldenRecord's CC path when chains
    * matter — single-hop is the predictable default).
    *
    * Cost: the candidate join runs on the DISTINCT-VALUE frame only
    * (category domains, not rows), length-banded (|len diff| ≤
    * maxDist is necessary for edit distance) so blocks stay sparse;
    * Spark's thresholded `levenshtein(l, r, k)` band-verifies.
    *
    * Output: (value, canonical, n_value, n_canonical) — the mapping
    * table; broadcast-join it onto the fact stream to apply. */
  def canonicalizeCategories(df: DataFrame, colName: String,
                             maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val vals = df.filter(col(colName).isNotNull)
      .groupBy(col(colName).cast("string").as("value"))
      .agg(count(lit(1)).as("n_value"))
      .withColumn("__len", length(col("value")))
    val probe = vals.withColumn("__band",
      explode(array((-maxDist to maxDist).map(d => col("__len") + d): _*)))
    val cand = probe.as("a").join(vals.as("b"),
        col("a.__band") === col("b.__len") &&
          levenshtein(col("a.value"), col("b.value"), maxDist) >= 0 &&
          levenshtein(col("a.value"), col("b.value"), maxDist) <= maxDist)
      .select(col("a.value").as("value"), col("a.n_value").as("n_value"),
        col("b.value").as("__cand"), col("b.n_value").as("__cn"))
    // argmax by (count desc, value asc) = min of (-count, value)
    cand.groupBy(col("value"), col("n_value"))
      .agg(min(struct((-col("__cn")).as("negn"), col("__cand").as("v"),
        col("__cn").as("n"))).as("__best"))
      .select(col("value"), col("__best.v").as("canonical"),
        col("n_value"), col("__best.n").as("n_canonical"))
  }

  /** Golden-record survivorship — entity resolution's LAST step, after
    * match pairs are clustered ([[linkRecords]] →
    * `graft.llmdata.DedupOps.connectedComponents`): collapse each
    * cluster of duplicate records to ONE canonical row, choosing every
    * attribute by deterministic MODE survivorship — the most frequent
    * NON-NULL value in the cluster, ties broken by smallest value (the
    * repo's argmax convention, same as [[canonicalizeCategories]] and
    * `Robust.impute`'s categorical rule). A cluster whose every value
    * for an attribute is NULL survives as NULL.
    *
    * Shape: one unpivot-free pass PER ATTRIBUTE — `k` attributes cost
    * k hash aggregates over (cluster, value) frames (values-scale
    * after the first aggregate) joined back on cluster id; no windows,
    * no all-pairs. At 100 TB the per-attribute aggregates all reuse
    * the cluster-id shuffle partitioning.
    *
    * `assign`: (idCol, clusterCol) mapping — every record id must
    * appear. Output: one row per cluster: clusterCol, n_records, and
    * each attribute under its original name. */
  def goldenRecords(records: DataFrame, idCol: String,
                    assign: DataFrame, clusterCol: String,
                    attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "attrCols required")
    val tagged = records.join(assign, Seq(idCol))
    val sizes = tagged.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_records"))
    attrCols.foldLeft(sizes) { (acc, a) =>
      // min(struct) forces SortAggregate — fine here: the frame is
      // (cluster × distinct-value) scale, never record scale (NOTES.md
      // string-min trap applies to row-scale aggregates only)
      val best = tagged.filter(col(a).isNotNull)
        .groupBy(col(clusterCol), col(a).as("__v"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col(clusterCol))
        .agg(min(struct((-col("__c")).as("negn"), col("__v").as("v")))
          .as("__best"))
        .select(col(clusterCol), col("__best.v").as(a))
      acc.join(best, Seq(clusterCol), "left")
    }
  }
}
