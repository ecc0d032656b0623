package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for LLM training-data pipelines (EXT
  * surface): corpus curation needs repeatable samples — the same inputs
  * must yield the same sample on every run, engine, and cluster size, or
  * training mixes are irreproducible. `rand()` fails all three, so every
  * operator here derives its randomness from an md5 content hash: pure
  * map-stage expressions, codegen'd, and mirrored exactly by the DuckDB
  * oracles.
  */
object Sampling {

  /** Uniform-in-[0,1) hash fraction of a key: the first 8 md5 hex chars as
    * a 32-bit integer over 2^32. Deterministic and engine-portable. */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** TEMPERATURE-SCALED source mixing (round-14) — the multilingual /
    * multi-source rebalancing rule every large pretraining mix uses:
    * sample source i with weight ∝ n_i^α so small sources up-weight
    * relative to their raw share. α is FIXED at 1/2 (temperature
    * T = 2): `sqrt` is the one power IEEE requires correctly rounded,
    * which is what keeps the per-source keep-rates — and therefore
    * the exact kept SET — bit-reproducible across engines (a general
    * n^α runs through libm `pow`, which carries no such guarantee;
    * for other temperatures compute the rates offline and call
    * [[stratifiedSample]] directly — the general mechanism stays
    * caller-controlled). Keep-rate per source:
    * `min(1, ((target·√n_i) / Σ_j√n_j) / n_i)` with the Σ folded
    * SEQUENTIALLY in source-name order (a parallel double Σ is
    * partition-order-dependent; sources are metadata-scale, so the
    * fold runs on the driver and the oracle replays it as a recursive
    * CTE). Selection is the [[hashFraction]] md5 bridge — one map
    * stage, no shuffle, no rand(). NULL sources drop. */
  def temperatureMix(df: DataFrame, keyCol: String, sourceCol: String,
                     targetRows: Long): DataFrame = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    val nonNull = df.filter(col(sourceCol).isNotNull)
    val counts = nonNull
      .groupBy(col(sourceCol).cast("string").as("__s"))
      .agg(count(lit(1)).cast("long").as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "temperatureMix: no non-null sources")
    var tot = 0.0
    counts.foreach { case (_, n) => tot += math.sqrt(n.toDouble) }
    val rates = counts.map { case (s0, n) =>
      s0 -> math.min(1.0,
        ((targetRows.toDouble * math.sqrt(n.toDouble)) / tot)
          / n.toDouble)
    }.toMap
    stratifiedSample(nonNull, keyCol, sourceCol, rates,
      defaultRate = 0.0)
  }

  /** Stratified Bernoulli sample with per-stratum rates: keep a row iff
    * its key's hash fraction falls under its stratum's rate (`defaultRate`
    * for unlisted strata). The classic training-mix downsampler (e.g.
    * per-language rates); one map stage, no shuffle, no state. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, r).otherwise(acc)
    }
    df.filter(hashFraction(col(keyCol)) < rate)
  }

  /** PER-ROW weighted Bernoulli sample: keep a row iff
    * `hashFraction(key)·scale < weight` — i.e. with probability
    * weight/scale, deterministically from the key hash. The
    * quality-weighted corpus downsampler ([[stratifiedSample]] keys
    * the rate on a stratum COLUMN VALUE; here every row carries its
    * own keep probability, e.g. a quality score): same md5 contract —
    * map-only, reproducible across runs/engines/corpus growth, and
    * the oracle mirrors the exact hash. Weights outside [0, scale]
    * behave as clamp (≤0 never keeps, ≥scale always keeps); NULL
    * weight drops the row (no silent default). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     scale: Double): DataFrame = {
    require(scale > 0.0, s"scale must be > 0, got $scale")
    df.filter(col(weightCol).isNotNull &&
      hashFraction(col(keyCol)) * lit(scale)
        < col(weightCol).cast("double"))
  }

  /** Deterministic uniform k-sample WITHOUT replacement per stratum —
    * the BOTTOM-K construction: keep the k rows whose md5 hash
    * fractions are smallest (ties by key). Because the hash is a
    * fixed function of the key, bottom-k is MERGEABLE (the bottom-k
    * of a union is the bottom-k of the parts' bottom-ks — the
    * classic distributed-sample/bottom-k-sketch property) and stable
    * under corpus growth except where a new row genuinely enters the
    * bottom set. Runs on [[graft.operators.TopK.perKey]] (the
    * bounded-heap operator), so no per-stratum sort — one hash
    * exchange + a streaming heap. Output: input columns + `frac`. */
  def bottomK(df: DataFrame, keyCol: String, stratumCol: String,
              k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.operators.TopK.perKey(
      df.withColumn("frac", hashFraction(col(keyCol))),
      Seq(stratumCol), Seq(("frac", true), (keyCol, true)), k)
  }

  /** Temperature-scaled corpus mixing weights at τ = 1/2 — the
    * multilingual-LM sampling classic (sample language i with
    * probability ∝ n_i^τ: τ=1 reproduces raw frequency and starves
    * low-resource groups, τ→0 approaches uniform and overfits them;
    * τ = 1/2 is the common middle and the ONE temperature whose power
    * is engine-portable — `sqrt` is IEEE-correctly-rounded everywhere,
    * while a general `pow` is libm and oracle-unsafe, which is why τ
    * is fixed rather than a parameter). Per group: exact count, its
    * sqrt, and the normalized weight. The normalizing Σ√n_i is a
    * DOUBLE sum over groups — order-dependent — so it folds over the
    * group-sorted list (`aggregate(sort_array(...))`), deterministic
    * and mirrored by the oracle's ordered `list_reduce`. Groups-scale
    * output; one aggregate + one broadcast. */
  def temperatureMixWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("sqrt_n", sqrt(col("n_docs").cast("double")))
    val total = counts
      .agg(aggregate(
        sort_array(collect_list(struct(col(groupCol), col("sqrt_n")))),
        lit(0.0), (acc, x) => acc + x.getField("sqrt_n")).as("__total"))
    counts.join(org.apache.spark.sql.functions.broadcast(total))
      .withColumn("weight", col("sqrt_n") / col("__total"))
      .drop("__total")
  }

  /** Deterministic train/val/test assignment: the hash fraction falls
    * into cumulative-weight buckets — (name, weight) splits in order,
    * weights normalized, the LAST split absorbing the full tail (so
    * float prefix sums can never leave a row unassigned). Same contract
    * as every operator here: content-hash randomness, so the assignment
    * is stable across runs, engines, cluster sizes — and across CORPUS
    * GROWTH (a doc's split never changes when other docs are added, the
    * property that keeps eval sets from silently bleeding into training
    * as the corpus is re-curated). Map-only, zero shuffles.
    *
    * Returns `df` plus a `split` column. Thresholds are exposed via
    * [[splitThresholds]] so oracle mirrors share the exact doubles. */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    val ts = splitThresholds(splits)
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit(salt)))
    val assigned = ts.init.foldLeft(Option.empty[Column] -> lit(splits.last._1)) {
      case ((acc, last), (name, t)) =>
        val c = acc match {
          case None    => when(frac < t, name)
          case Some(w) => w.when(frac < t, name)
        }
        (Some(c), last)
    } match { case (Some(w), last) => w.otherwise(last); case (None, last) => last }
    df.withColumn("split", assigned)
  }

  /** Exact-count stratified split — [[splitAssign]]'s complement for
    * when the PROPORTIONS are the contract, not per-doc stability:
    * within every stratum, split sizes are exactly ⌊n·w/W⌋ by
    * cumulative integer weight (the last split absorbs the remainder),
    * never the ±√n drift of Bernoulli hashing. The trade is documented
    * growth-INstability: ranks shift when the stratum grows, so a doc's
    * split can change across curations — use [[splitAssign]] (or
    * [[splitByCluster]]) when eval-set stability matters more than
    * exact counts.
    *
    * Determinism: rows order by md5(key‖salt) (content-hash shuffle,
    * ties by key), and every threshold is integer arithmetic —
    * (n·cumWeight) div W — so the assignment is bit-stable across
    * engines and cluster sizes. Shape: ONE stratum-keyed sort window
    * (rank + stratum size from the same exchange), then a map-stage
    * CASE. Strata sort independently — skew bounded by the largest
    * stratum (pre-split upstream if one stratum dominates). */
  def exactStratifiedSplit(df: DataFrame, keyCol: String, stratumCol: String,
                           splits: Seq[(String, Long)],
                           salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive integer weights: $splits")
    val totalW = splits.map(_._2).sum
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))).asc,
        col(keyCol).asc)
    val cums = splits.scanLeft(0L)(_ + _._2).tail
    val withRank = df
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(stratumCol))).cast("long"))
    val assigned = splits.init.zip(cums.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cw)) =>
        val hit = col("__rn") <= expr(s"(__n * ${cw}L) div ${totalW}L")
        Some(acc.fold(when(hit, name))(_.when(hit, name)))
      }.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    withRank.withColumn("split", assigned).drop("__rn", "__n")
  }

  /** Leakage-safe [[splitAssign]]: hash the near-dup CLUSTER
    * representative instead of the document id, so every member of a
    * near-dup cluster lands in the SAME split — the fix for the
    * train/test bleed that q101's audit detects (a doc and its near-
    * duplicate in different splits silently inflates eval scores).
    * `clusters` is [[DedupOps.nearDupClusters]]' (doc_id, cluster_id)
    * frame; unpaired documents (absent from it) hash their own id,
    * identical to [[splitAssign]]. Same growth-stability contract: a
    * doc's split changes only if its CLUSTER membership changes.
    *
    * Shape: the cluster frame is the tiny near-dup slice (size-gated
    * broadcast left join); the assignment itself stays a map stage. */
  def splitByCluster(df: DataFrame, idCol: String, clusters: DataFrame,
                     splits: Seq[(String, Double)],
                     salt: String = ""): DataFrame = {
    val rep = clusters.select(col("doc_id").as(idCol), col("cluster_id"))
    val withRep = df
      .join(graft.operators.Broadcasts.maybeBroadcast(rep), Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("cluster_id").cast("string"),
        col(idCol).cast("string")))
      .drop("cluster_id")
    splitAssign(withRep, "__rep", splits, salt).drop("__rep")
  }

  /** Leakage-safe TEMPORAL split: per entity, the time-ordered LAST
    * `testPct`% of events become the test set — the backtest
    * convention, where a hash split would leak the future into
    * training (a model must never train on events after its own test
    * window FOR THAT ENTITY). Equal-instant ties order by descending
    * `idCol` (larger id = later), so the cut is total-ordered and
    * engine-deterministic.
    *
    * Exact integer allocation: an entity with n events puts
    * `n·testPct div 100` (floor) in test — entities with few events
    * keep everything in train rather than surrendering their only
    * rows. One per-entity window (rank + count on the same key
    * shuffle), no global ordering anywhere.
    *
    * Output: df columns + `split` ('train' | 'test'). */
  def temporalSplit(df: DataFrame, entityCol: String, tsCol: String,
                    idCol: String, testPct: Int): DataFrame = {
    require(testPct >= 0 && testPct <= 100, s"testPct in [0,100], got $testPct")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val wAll = Window.partitionBy(col(entityCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("split",
        when(col("__rn") <= expr(s"(__n * $testPct) div 100"), lit("test"))
          .otherwise(lit("train")))
      .drop("__rn", "__n")
  }

  /** Deterministic negative sampling for contrastive training: for
    * every anchor in `positives`, exactly `k` pseudo-random items the
    * anchor is NOT paired with — reproducible run to run (md5 draws,
    * never `rand()`), and with NO anchor×universe cross join anywhere:
    * each anchor generates `k + oversample` candidate DRAWS map-side
    * (`hash(anchor, j) mod N` indexes into the item universe), the
    * draws join the dense item index on the index key, known positives
    * anti-join out, duplicate draws collapse to their first draw
    * number, and the first `k` survivors (by draw order) win. The
    * oversample margin absorbs positive/duplicate collisions; anchors
    * whose margin runs out return fewer than `k` (raise `oversample`
    * — at real universe sizes collisions are rare).
    *
    * The dense item index is bucket-decomposed like
    * [[hashOrderedCumsum]]: items order by (md5(item), item), the
    * 2-hex-char prefix partitions the universe into 256 buckets, and
    * per-bucket row_numbers plus a 256-row offset table (the only
    * unpartitioned window — metadata-scale by construction) reassemble
    * the exact global dense index. No single-partition window ever
    * sees the item catalog, so the index holds at billion-item scale.
    * The N-row count rides a one-row broadcast. Modulo bias over N is
    * the standard, documented trade.
    *
    * Output: (anchorCol, itemCol, draw_index). */
  def negativeSample(positives: DataFrame, anchorCol: String,
                     itemCol: String, items: DataFrame,
                     k: Int, oversample: Int = 8): DataFrame = {
    require(k >= 1 && oversample >= 0, s"bad k=$k / oversample=$oversample")
    import org.apache.spark.sql.expressions.Window
    val it = items.select(col(itemCol)).distinct()
      .withColumn("__h", md5(col(itemCol).cast("string")))
      .withColumn("__bk", substring(col("__h"), 1, 2))
    val bCounts = it.groupBy(col("__bk")).agg(count(lit(1)).as("__bn"))
    val wB = Window.orderBy(col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = bCounts
      .withColumn("__off", (sum(col("__bn")).over(wB) - col("__bn")).cast("long"))
      .select(col("__bk"), col("__off"))
    val wIn = Window.partitionBy(col("__bk"))
      .orderBy(col("__h").asc, col(itemCol).asc)
    val idx = it.join(broadcast(offs), Seq("__bk"))
      .withColumn("__idx",
        col("__off") + row_number().over(wIn).cast("long") - 1)
      .select(col(itemCol), col("__idx"))
    val n = idx.agg(count(lit(1)).as("__n"))
    val draws = positives.select(col(anchorCol)).distinct()
      .join(graft.operators.Broadcasts.maybeBroadcast(n))
      .select(col(anchorCol), col("__n"),
        explode(sequence(lit(0), lit(k + oversample - 1))).as("draw_index"))
      .withColumn("__idx",
        conv(substring(md5(concat(col(anchorCol).cast("string"), lit("#"),
          col("draw_index"))), 1, 8), 16, 10).cast("long") % col("__n"))
    draws
      .join(graft.operators.Broadcasts.maybeBroadcast(idx), Seq("__idx"))
      .join(positives.select(col(anchorCol), col(itemCol)).distinct(),
        Seq(anchorCol, itemCol), "left_anti")
      .groupBy(col(anchorCol), col(itemCol))
      .agg(min(col("draw_index")).as("draw_index"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(anchorCol)).orderBy(col("draw_index").asc)))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Cumulative normalized thresholds for [[splitAssign]] — (name,
    * upper_bound) per split, last bound exactly 1.0. */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, Double)] = {
    require(splits.nonEmpty, "splitAssign: no splits")
    require(splits.map(_._1).distinct.size == splits.size, "duplicate split names")
    require(splits.forall(_._2 > 0), "split weights must be > 0")
    val total = splits.map(_._2).sum
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.map(_._1).zip(cum.map(_ / total))
  }

  /** Resample a corpus to a TARGET mix: given desired per-stratum shares
    * (e.g. language or source weights for a training run), keep the
    * largest downsample-only subset whose expected composition matches
    * the targets exactly. K = minᵢ(Nᵢ/targetᵢ) is the largest total with
    * no stratum upsampled; stratum i keeps targetᵢ·K rows in expectation
    * (rate = targetᵢ·K/Nᵢ, and the binding stratum keeps everything).
    * Strata absent from `targets` are dropped (share 0).
    *
    * Unlike [[stratifiedSample]] (caller provides RATES), this derives
    * the rates FROM the data — the operator a mixing step actually wants:
    * "make the corpus 40% en / 30% de / 30% fr" without hand-computing
    * per-run rates as counts drift.
    *
    * Shape at 100 TB: the count table is strata-scale, joined as a
    * broadcast frame (no driver collect); membership is the same
    * hash-fraction map filter as [[stratifiedSample]] — deterministic,
    * engine-portable, reproducible across runs and cluster sizes. Two
    * corpus passes (counts, then filter) — inherent, the rates depend on
    * a global aggregate. */
  def resampleToMix(df: DataFrame, keyCol: String, stratumCol: String,
                    targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "resampleToMix: empty target map")
    require(targets.values.forall(_ > 0), "resampleToMix: targets must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.sortBy(_._1).toDF("__stratum", "__target")
    val counts = df.groupBy(col(stratumCol).cast("string").as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    // inner join: untargeted strata get no rate row and are dropped
    val ratios = counts.join(broadcast(tgt), Seq("__stratum"))
      .withColumn("__ratio", col("__n").cast("double") / col("__target"))
    val k = ratios.agg(min(col("__ratio")).as("__k"))
    val rates = ratios.crossJoin(broadcast(k))
      .withColumn("__rate", col("__target") * col("__k") / col("__n").cast("double"))
      .select(col("__stratum"), col("__rate"))
    df.join(broadcast(rates), col(stratumCol).cast("string") === col("__stratum"))
      .filter(hashFraction(col(keyCol)) < col("__rate"))
      .drop("__stratum", "__rate")
  }

  /** Deterministic global shuffle + shard assignment — the export step
    * that turns a curated corpus into training shards: every row gets a
    * pseudorandom but REPRODUCIBLE position (same inputs + salt → same
    * permutation on any engine or cluster size; a new `salt` is a fresh
    * epoch-level permutation). shard = floor(hashFrac × nShards), so
    * shards are contiguous ranges of the hash fraction and shard sizes
    * are uniform in expectation; `position` orders rows within a shard
    * by the same fraction (ties by key — total order).
    *
    * Shape at 100 TB: the fraction is a map-stage expression; the only
    * exchange is one partition-by-shard sort — exactly the
    * repartition + sortWithinPartitions shuffle [[exportShards]] runs.
    * No global ordering bottleneck: position is per-shard. */
  def shuffleShard(df: DataFrame, keyCol: String, nShards: Int,
                   salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__frac").asc, col(keyCol).asc)
    df.withColumn("__frac", frac)
      .withColumn("shard", floor(col("__frac") * nShards).cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("__frac")
  }

  /** Write a [[shuffleShard]]-shuffled corpus as partitioned JSONL — the
    * on-disk layout a training loader streams: `path/shard=N/….json`,
    * one JSON object per line, lines in shuffled (position) order within
    * each shard. One shuffle (repartition on shard) + an in-partition
    * sort; at 100 TB each shard writes in parallel and no global sort
    * materializes. */
  def exportShards(df: DataFrame, keyCol: String, nShards: Int, path: String,
                   salt: String = ""): Unit =
    shuffleShard(df, keyCol, nShards, salt)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("position"))
      .write.mode("overwrite").partitionBy("shard").json(path)

  /** Exact INCLUSIVE cumulative weight in content-hash order, without a
    * corpus-wide single-partition window: the md5 hex prefix (2 chars =
    * 256 buckets) partitions the corpus, and because a string sorts
    * after its prefix-mates consistently, (bucket, hash, key) order ==
    * (hash, key) order — so per-bucket distributed running sums plus a
    * 256-row bucket-offset table (the only unpartitioned window,
    * metadata-scale) reassemble the exact global cumsum. The
    * globalNtile decomposition, keyed by hash prefix instead of score.
    * Returns df + `__hash` + `__cw` (inclusive). */
  private def hashOrderedCumsum(df: DataFrame, keyCol: String,
                                weightCol: String, salt: String): DataFrame = {
    val hashed = df
      .withColumn("__hash", md5(concat(col(keyCol).cast("string"), lit(salt))))
      .withColumn("__b", substring(col("__hash"), 1, 2))
    val bucketTotals = hashed.groupBy(col("__b"))
      .agg(sum(col(weightCol)).cast("long").as("__bw"))
    val wB = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketTotals
      .withColumn("__off", (sum(col("__bw")).over(wB) - col("__bw")).cast("long"))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b"))
      .orderBy(col("__hash").asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hashed.join(broadcast(offsets), Seq("__b"))
      .withColumn("__cw",
        (col("__off") + sum(col(weightCol)).over(wIn)).cast("long"))
      .drop("__b", "__off")
  }

  /** Systematic weight-proportional sampling (PPS): exactly `k` grid
    * hits over the corpus's cumulative-weight line in content-hash
    * order — the "sample documents proportional to token count"
    * primitive. Item i with weight interval [cw−w, cw) receives
    *   n_hits = ⌈k·cw/W⌉ − ⌈k·(cw−w)/W⌉
    * (the count of grid multiples j·W/k inside its interval, computed
    * in EXACT integer arithmetic — Σ n_hits = k by construction, no
    * float grid positions to disagree on). Items with w ≥ W/k are
    * always selected (possibly multiply — keep n_hits as a
    * replication count for mix building); inclusion probability for
    * small items is k·w/W. Deterministic per (salt, corpus); the
    * caller's weights must be positive integers with k·W < 2^63
    * (token counts at any realistic k: fine).
    *
    * Shape: [[hashOrderedCumsum]] (distributed) + a broadcast one-row
    * total + a map-stage hit count. */
  def systematicWeighted(df: DataFrame, keyCol: String, weightCol: String,
                         k: Long, salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cum = hashOrderedCumsum(df, keyCol, weightCol, salt)
    val total = cum.agg(max(col("__cw")).cast("long").as("__W"))
    cum.crossJoin(broadcast(total))
      // ceil(a/W) on non-negatives = (a + W − 1) div W, exact integers
      .withColumn("__hi", col("__cw") * lit(k) + col("__W") - lit(1L))
      .withColumn("__lo",
        (col("__cw") - col(weightCol)) * lit(k) + col("__W") - lit(1L))
      .withColumn("n_hits",
        (expr("__hi div __W") - expr("__lo div __W")).cast("long"))
      .filter(col("n_hits") >= 1)
      .drop("__hash", "__cw", "__W", "__hi", "__lo")
  }

  /** Deterministic token-budget subset: documents in content-hash order
    * whose INCLUSIVE cumulative weight stays within `budget` — "give me
    * a ~B-token random-but-reproducible slice of the corpus". The
    * prefix property is what makes budgets nest: the 1B-token subset
    * is a prefix of the 10B-token subset under the same salt (grow a
    * training mix without resampling what you already trained on).
    * Returns the surviving rows plus their `cum_weight`. */
  def tokenBudgetSubset(df: DataFrame, keyCol: String, weightCol: String,
                        budget: Long, salt: String = ""): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    hashOrderedCumsum(df, keyCol, weightCol, salt)
      .filter(col("__cw") <= budget)
      .withColumn("cum_weight", col("__cw"))
      .drop("__hash", "__cw")
  }

  /** Exact global NTILE without a single-partition window over the corpus
    * — the curriculum-bucketing primitive (order a corpus by a quality /
    * difficulty score, cut it into `nBuckets` equal slices for staged
    * training). A naive `ntile(n) OVER (ORDER BY score)` funnels 100 TB
    * through ONE task; this operator reproduces ntile's exact semantics
    * (bucket sizes differ by ≤1, earlier buckets take the remainder) from
    * an exact global rank assembled in three scale-safe pieces:
    *
    *   1. distinct-score count table (hash agg, map-side combine) and its
    *      running sum — the only single-partition window, over the
    *      DISTINCT-SCORE table (scores are rounded/coarse by contract:
    *      vocabulary-scale, not corpus-scale);
    *   2. per-score `row_number` ordered by key — partitioned by score,
    *      fully distributed;
    *   3. rank = scores-before + rank-within-score; bucket via the SQL
    *      ntile formula in exact integer arithmetic: with q = N÷n,
    *      r = N mod n, the first r buckets hold q+1 rows.
    *
    * Ordering is (score `descending`, key ascending) — a total order, so
    * the result is bit-identical to the one-window form (the oracle runs
    * plain ntile). Returns `df` plus a `bucket` column in [1, nBuckets]. */
  def globalNtile(df: DataFrame, keyCol: String, scoreCol: String,
                  nBuckets: Int, descending: Boolean = true): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val scoreOrd = if (descending) col(scoreCol).desc else col(scoreCol).asc
    val counts = df.groupBy(col(scoreCol).as("__score"))
      .agg(count(lit(1)).as("__cnt"))
    val wCum = Window.orderBy(if (descending) col("__score").desc else col("__score").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // lattice guard below the window (round-14, VERDICT r13 #3): the
    // coarse-score contract above is ENFORCED — a continuous score
    // column (lattice ≈ corpus) refuses loudly before the
    // single-partition exchange instead of collapsing onto one task
    val total = counts.agg(sum(col("__cnt")).cast("long").as("__n"),
      count(lit(1)).as("__nlat"))
    val cum = counts
      .crossJoin(broadcast(total))
      .withColumn("__cnt", graft.operators.PlanAudit.latticeGuard(
        col("__cnt"), col("__nlat"), "globalNtile"))
      .withColumn("__before", sum(col("__cnt")).over(wCum) - col("__cnt"))
      .select(col("__score"), col("__before"))
    val wIn = Window.partitionBy(col(scoreCol)).orderBy(col(keyCol).asc)
    val ranked = df
      .join(broadcast(cum), col(scoreCol) === col("__score"))
      .crossJoin(broadcast(total.drop("__nlat")))
      .withColumn("__rank", col("__before") + row_number().over(wIn))
    // SQL ntile: i0 = rank-1, q = N÷n, r = N mod n; buckets 1..r get q+1.
    // Exact integer division for non-negative longs: (a - a mod b) is
    // divisible by b, so the double division is IEEE-exact for any count
    // below 2^53 (plain `/` on longs is double division; a raw cast could
    // round across an integer boundary at extreme magnitudes)
    def floorDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val i0 = col("__rank") - 1
    val q = floorDiv(col("__n"), lit(nBuckets.toLong))
    val r = pmod(col("__n"), lit(nBuckets.toLong))
    val bucket = when(i0 < (q + 1) * r, floorDiv(i0, q + 1) + 1)
      .otherwise(r + floorDiv(i0 - (q + 1) * r, greatest(q, lit(1L))) + 1)
    ranked.withColumn("bucket", bucket.cast("int"))
      .drop("__score", "__before", "__n", "__rank")
  }

  /** Fractional epoch replication — the UPSAMPLING half of training-mix
    * construction ([[resampleToMix]] only downsamples): stratum i's rows
    * each appear `epochs(i)` times in expectation. A row gets
    * floor(e) guaranteed copies plus one more iff its hash fraction falls
    * under frac(e) — so e = 2.3 means every row appears twice and a
    * deterministic 30% slice appears a third time (the standard way a
    * high-value source is repeated for 2–3 epochs while commons crawl
    * runs under 1). e < 1 degenerates to Bernoulli downsampling, e = 0
    * (or an unlisted stratum with `defaultEpochs` 0) drops the stratum.
    *
    * Determinism contract: the extra-copy coin is the same md5 hash
    * fraction as every sampler here, salted with "#rep" so it is
    * independent of the membership coins of [[stratifiedSample]] /
    * [[splitAssign]]. Output rows carry `copy_index` (0-based), so
    * downstream shuffling ([[shuffleShard]] keyed on key+copy_index)
    * spreads the copies across shards.
    *
    * Shape at 100 TB: pure map work — the copy count is a per-row
    * expression and the fan-out is one `sequence` explode (a codegen'd
    * generator); no shuffle, no state, output size = Σᵢ eᵢ·Nᵢ by
    * construction. */
  def replicateByEpochs(df: DataFrame, keyCol: String, stratumCol: String,
                        epochs: Map[String, Double],
                        defaultEpochs: Double = 0.0): DataFrame = {
    require(epochs.values.forall(_ >= 0) && defaultEpochs >= 0,
      "replicateByEpochs: epoch factors must be >= 0")
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (stratum, v)) =>
      when(col(stratumCol) === stratum, v).otherwise(acc)
    }
    val extra = (hashFraction(concat(col(keyCol).cast("string"), lit("#rep")))
      < (e - floor(e))).cast("int")
    val nCopies = (floor(e).cast("int") + extra).as("__n_copies")
    // guard BEFORE the explode: Spark's sequence(0, -1) yields a
    // DESCENDING [0, -1], not an empty array
    df.withColumn("__n_copies", nCopies)
      .filter(col("__n_copies") >= 1)
      .withColumn("copy_index", explode(sequence(lit(0), col("__n_copies") - 1)))
      .drop("__n_copies")
  }

  /** Fixed-size per-stratum sample: the `n` rows with the smallest hash
    * fractions in each stratum (ties broken by key) — a deterministic
    * reservoir-sample analog. One shuffle on the stratum key; the window
    * top-n is map-side-limited by WindowGroupLimit. */
  def perStratumSample(df: DataFrame, keyCol: String, stratumCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashFraction(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Quality-ordered per-stratum quota: keep the best `cap` rows of each
    * stratum under an explicit total order (e.g. quality desc, id asc) —
    * the domain-capping step of web-corpus curation (no single site may
    * dominate the training mix), where [[perStratumSample]] keeps a
    * RANDOM fixed-size subset this keeps the TOP one.
    *
    * Emits the surviving rows plus their 1-based `rank_in_stratum`. One
    * shuffle; the `row_number <= cap` filter becomes a WindowGroupLimit,
    * so every partition discards past-cap rows map-side before the sort —
    * a hot domain with 10^9 pages ships only `cap` rows per partition to
    * the final window. `orderCols` must be a TOTAL order (append the
    * unique id) or ranks are nondeterministic.
    */
  def capPerStratum(df: DataFrame, stratumCol: String, orderCols: Seq[Column],
                    cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(stratumCol)).orderBy(orderCols: _*)
    df.withColumn("rank_in_stratum", row_number().over(w))
      .filter(col("rank_in_stratum") <= cap)
  }

  /** Temperature-based mix sampling: draw a `budget`-row corpus whose
    * per-stratum shares follow nᵅ instead of n — the multilingual-corpus
    * flattening rule (α < 1 boosts low-resource strata relative to their
    * raw counts; α = 1 is proportional, α = 0 is uniform). Stratum s gets
    * quota = ⌊budget · wₛ / Σw⌋ capped at nₛ (downsample-only, no
    * upsampling; floor allocation may undershoot `budget` by < #strata
    * rows). Membership is the deterministic hash-rank order — the quota
    * CHEAPEST-rank rows of each stratum — so the sample is reproducible
    * and GROWS MONOTONICALLY with budget (a bigger budget only adds rows,
    * a property epoch schedulers rely on).
    *
    * α = 0.5 (the default, and the common published setting) computes
    * integer-exact weights wₛ = ⌊√nₛ⌋: IEEE sqrt is correctly rounded on
    * every engine, so quotas are bit-portable. Other α use
    * wₛ = ⌊nₛᵅ·10⁶⌋ via libm `pow` — deterministic within one engine,
    * documented last-ulp risk across engines (spec-proven here, not
    * oracle-compared).
    *
    * Shape at 100 TB: counts and quotas are strata-scale (broadcast
    * join); selection is one row_number window per stratum — the same
    * single shuffle as [[perStratumSample]]. budget·wₛ stays within
    * BIGINT for budgets to ~10¹² at α = 0.5. */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
                     budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val weight =
      if (alpha == 0.5) floor(sqrt(col("__n").cast("double"))).cast("long")
      else floor(pow(col("__n").cast("double"), lit(alpha)) * lit(1e6)).cast("long")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", weight)
    val quotas = counts
      .crossJoin(broadcast(counts.agg(sum(col("__w")).as("__wt"))))
      .withColumn("__quota", least(expr(s"(${budget}L * __w) div __wt"), col("__n")))
      .select(col(stratumCol), col("__quota"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashFraction(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("rank_in_stratum", row_number().over(w))
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("rank_in_stratum") <= col("__quota"))
      .drop("__quota")
  }

  /** Padding-waste report for length-bucketed batch assembly: order the
    * corpus by (token count, id) — the total order a dynamic-batching
    * loader uses — cut it into fixed-size batches, and report per batch
    * how many pad tokens the batch-max padding convention burns
    * (`padded = n_docs × max_tokens`, `waste = padded − sum_tokens`).
    * This is the report that justifies length-bucketed batching: sorted
    * batches put like-sized docs together, so waste_frac collapses vs
    * arrival-order batching. All counts are exact BIGINTs; the fraction
    * is ONE division.
    *
    * The global rank is NOT a single-partition window: per-value counts
    * aggregate first (the value domain — distinct token LENGTHS — is
    * bounded, the q153 partial-quantile argument), the exclusive
    * cumulative runs over that value-count table, and each doc's rank =
    * its value's cumulative-before + its row_number within the value
    * (window partitioned by token count — distributed). `idCol` must be
    * unique: it is the tie-break that makes the order total and the
    * batches engine-portable. */
  def paddingWaste(df: DataFrame, idCol: String, tokenCol: String,
                   batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val vc = df.groupBy(col(tokenCol).as("__v")).agg(count(lit(1)).as("__cnt"))
    val cum = vc
      .withColumn("__cum_before",
        coalesce(sum(col("__cnt")).over(Window.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .select(col("__v"), col("__cum_before"))
    val byVal = Window.partitionBy(col(tokenCol)).orderBy(col(idCol))
    df.join(graft.operators.Broadcasts.maybeBroadcast(cum),
        col(tokenCol) === col("__v"))
      .withColumn("__rank",
        col("__cum_before") + row_number().over(byVal).cast("long") - 1L)
      .withColumn("batch_id", expr(s"__rank div $batchSize"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col(tokenCol)).cast("long").as("max_tokens"),
        sum(col(tokenCol)).cast("long").as("sum_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("max_tokens"))
      .withColumn("waste_tokens", col("padded_tokens") - col("sum_tokens"))
      .withColumn("waste_frac", col("waste_tokens").cast("double")
        / greatest(col("padded_tokens"), lit(1L)).cast("double"))
  }

  /** Per-group rank (quantile) normalization: map each row's score to
    * its within-group quantile position `pos / (n + 1)` — the
    * calibration step before comparing quality scores ACROSS sources
    * whose scorers sit on different scales (source A's 0.9 and source
    * B's 0.4 may be the same percentile; a single global threshold
    * over raw scores silently over-keeps whichever source scores
    * generously). After normalization a global cut keeps the same
    * fraction of every group by construction.
    *
    * Position is `row_number` under the total (score, key) order —
    * ties broken by key, so the mapping is deterministic; the quantile
    * is exact integers with ONE division. Shape: one window
    * PARTITIONED by group (no global sort; the heaviest task is the
    * largest single group — for a handful of billion-row sources,
    * compose per-group via [[globalNtile]]'s hash-prefix cumsum
    * instead). */
  def quantileNormalize(df: DataFrame, keyCol: String, groupCol: String,
                        scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(keyCol).asc)
    val n = Window.partitionBy(col(groupCol))
    df.withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(n))
      .withColumn("quantile",
        col("pos").cast("double") / (col("n") + lit(1L)).cast("double"))
  }

  /** Purged K-fold with embargo — leakage-safe cross-validation for
    * TEMPORAL data (López de Prado 2018's answer to the fact that
    * plain K-fold leaks: a train row whose timestamp abuts the test
    * window carries overlapping information): the time axis is cut
    * into `k` row-balanced contiguous folds, and for each fold the
    * remaining rows are TRAIN only if they sit strictly more than
    * `embargoSeconds` outside the fold's [min, max] time span —
    * everything in the margin is PURGED (excluded from both sides).
    *
    * Fold boundaries come from the distinct-timestamp lattice
    * (cumulative row counts → `fold = (cum_before·k) div n`), so every
    * distinct instant lands wholly in one fold — ties never straddle a
    * boundary and the purge rule is well-defined. The lattice
    * cumulative is the one global window (values-scale, documented);
    * fold spans are a k-row broadcast.
    *
    * Output: `k` rows per input row — (input columns…, fold, role ∈
    * 'test' | 'train' | 'purged') — the assignment table a CV driver
    * joins against; cost is the deliberate k-way explode (k is 5-10).
    * NULL-timestamp rows are excluded (no position on the time axis). */
  def purgedKFold(df: DataFrame, tsCol: String, k: Int,
                  embargoSeconds: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(embargoSeconds >= 0, s"embargoSeconds must be >= 0")
    val base = df.filter(col(tsCol).isNotNull)
    val w = Window.orderBy(col("__ts").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // lattice guard below the window (round-14, VERDICT r13 #3):
    // exact-timestamp instants are the canonical continuous key — a
    // row-scale instant lattice refuses loudly (round the timestamps
    // to a fold-safe grain first) instead of one-task collapse
    val lattice = base.groupBy(col(tsCol).as("__ts"))
      .agg(count(lit(1)).as("__cnt"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__n"),
        count_distinct(col(tsCol)).as("__nlat"))))
      .withColumn("__cnt", graft.operators.PlanAudit.latticeGuard(
        col("__cnt"), col("__nlat"), "purgedKFold"))
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("fold",
        expr(s"((__cum - __cnt) * $k) div __n").cast("int"))
    val spans = lattice.groupBy(col("fold"))
      .agg(min(col("__ts")).as("__f_min"), max(col("__ts")).as("__f_max"))
    val assigned = base.join(lattice.select(col("__ts"), col("fold")
      .as("__own_fold")), base(tsCol) === col("__ts"))
      .drop("__ts")
    // the embargo compares timestamps DIRECTLY in their own type
    // (timestamp_ntz stays ntz): an earlier unix_micros(cast(...))
    // form routed ntz values through the session timezone, which is
    // nonlinear across a DST transition in a non-UTC session — an
    // embargo window straddling the jump would mislabel rows by ±1h
    val emb = expr(s"make_dt_interval(0, 0, 0, ${embargoSeconds}L)")
    assigned
      .crossJoin(broadcast(spans))
      .withColumn("role",
        when(col("__own_fold") === col("fold"), lit("test"))
          .when(col(tsCol) < col("__f_min") - emb, lit("train"))
          .when(col(tsCol) > col("__f_max") + emb, lit("train"))
          .otherwise(lit("purged")))
      .drop("__own_fold", "__f_min", "__f_max")
  }
}
