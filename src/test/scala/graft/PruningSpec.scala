package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.incremental.Writers

/** Physical-plan evidence for the scale posture: month filters on the
  * partitioned staging layout prune at the partition level (file skipping,
  * not scan+filter), and compaction bounds file counts. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("month filter on partitioned staging prunes partitions in the plan") {
    val path = Files.createTempDirectory("graft-prune").toString + "/staging"
    val rows = Seq("2024-01-10", "2024-02-10", "2024-03-10").flatMap(d =>
      (1 to 100).map(i => (s"$d 00:0${i % 6}:00", i.toDouble)))
    Writers.monthOverwrite(
      rows.toDF("s", "x").select($"s".cast("timestamp").as("tpep_pickup_datetime"), $"x"),
      path, "tpep_pickup_datetime")

    val feb = spark.read.parquet(path).filter($"pickup_month" === "2024-02")
    assert(feb.count() == 100)
    val planText = feb.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters") && planText.contains("pickup_month"),
      s"month predicate must prune partitions:\n$planText")
    // data filters must NOT mention the partition column (it never reaches
    // the row-level filter — pruning happened at planning time)
    assert(!planText.contains("PushedFilters: [IsNotNull(pickup_month"))
  }

  test("dimension joins broadcast (q26/q27 plan shape)") {
    // PLANS.md claims, frozen as assertions so plan shapes can't silently
    // regress: small dimension sides must become BroadcastHashJoin
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q26_join_enrich", "q27_star_join")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q must broadcast its dimension side:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q must not shuffle-sort a broadcastable dimension:\n$plan")
    }
  }

  test("silver dedup runs one exchange with a map-side group limit (q02/q46 plan shape)") {
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q02_silver_clean", "q46_trip_silver")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan
      val text = plan.toString
      // WindowGroupLimit prunes each key's rows to the top-1 BEFORE the
      // exchange — the dedup never shuffles more than one row per key-ish
      assert(text.contains("WindowGroupLimit"),
        s"$q dedup must use the map-side window group limit:\n$text")
      val exchanges = text.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
      assert(exchanges <= 2, s"$q must not add exchanges beyond the dedup shuffle:\n$text")
    }
  }

  test("language-profile join broadcasts the profile frame (q32 plan shape)") {
    val plan = SparkEntry.queries("q32_langid")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the (lang, term, weight) profile frame must broadcast:\n$plan")
  }

  test("IVF corpus cell assignment is a pure map stage (zero exchanges)") {
    import graft.llmdata.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", nCells = 4, iters = 1)
    val plan = Similarity.assignCorpusCells(emb, "vec_id", "embedding", cents)
      .queryExecution.executedPlan
    assert(countExchanges(plan) == 0,
      s"corpus assignment must not shuffle (was the r2 scale-killer):\n$plan")
    // and it agrees with the crossJoin + window-rank form on every vector
    // (same scoring, same lowest-cell_id tie-break)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"sim".desc, $"cell_id".asc)
    val viaWindow = emb.select($"vec_id", $"embedding")
      .crossJoin(broadcast(cents))
      .withColumn("sim", Similarity.cosineNative($"embedding", $"centroid"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"cell_id".cast("long").as("cell"))
    val mapStage = Similarity.assignCorpusCells(emb, "vec_id", "embedding", cents)
      .select($"vec_id", $"cell")
    assert(mapStage.join(viaWindow, Seq("vec_id", "cell")).count() == emb.count(),
      "map-stage assignment must match the window-rank assignment row-for-row")
  }

  /** Exchange count from the RENDERED tree: `plan.collect` cannot see
    * through AdaptiveSparkPlanExec (a leaf wrapper — its inner plan is
    * not a child), so node-collect assertions on AQE plans are vacuous;
    * the toString renders the whole tree. Counts shuffle AND broadcast
    * exchanges. */
  private def countExchanges(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.toString.linesIterator.count(_.contains("Exchange"))

  test("round-3/4 EXT queries never plan all-pairs joins (q76/q78/q80/q81/q83)") {
    // these operators exist BECAUSE the naive form is quadratic: freeze
    // the evidence that every join is an equi-join (hash/sort-merge),
    // never a nested-loop or cartesian product over the corpus
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q76_repetition", "q78_containment_pairs",
        "q80_semantic_dedup", "q81_scrub_boilerplate", "q83_containment_search")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q must not plan a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a nested-loop join:\n$plan")
    }
  }

  test("int8 quantization is a pure map stage (q77 plan shape)") {
    import graft.llmdata.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .queryExecution.executedPlan
    assert(countExchanges(plan) == 0,
      s"quantization must not shuffle (once-per-corpus storage pass):\n$plan")
  }

  test("shuffle-shard export plans exactly one exchange (q82 plan shape)") {
    import graft.llmdata.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Sampling.shuffleShard(docs, "doc_id", 8, "s1")
      .queryExecution.executedPlan
    assert(countExchanges(plan) == 1,
      s"the hash fraction is map-stage; only the per-shard sort may shuffle:\n$plan")
  }

  test("exact-join wave plans equi-joins only (q127/q130/q134/q136)") {
    // prefix filtering, length blocking, and window-set joins exist to
    // AVOID quadratic scans; freeze the evidence that every join in
    // their plans hashes a key (the range/threshold conditions ride as
    // post-join filters on an equi-join, never a nested loop)
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q127_prefix_jaccard", "q130_edit_neardup",
        "q134_novelty", "q136_batch_novelty", "q138_edit_blocked",
        "q140_dup_span_scrub", "q141_dedup_corpus_best")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q must not plan a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a nested-loop join:\n$plan")
    }
  }

  test("round-4 EXT queries never plan all-pairs joins (q96/q97/q98)") {
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q96_knn_graph", "q97_lm_familiarity", "q98_cooccurrence")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q must not plan a cartesian product:\n$plan")
      // q98's single BroadcastNestedLoopJoin is the sanctioned one-row
      // scalar cross join (the tfidf/mixReport pattern); corpus-side
      // candidate generation must still be equi-joins only
      val allowedBnlj = if (q == "q98_cooccurrence") 1 else 0
      val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      assert(bnlj <= allowedBnlj,
        s"$q must not plan a nested-loop join over corpus-scale sides:\n$plan")
    }
  }

  test("epoch replication and z-value are pure map stages (q99/q100 plan shape)") {
    import graft.llmdata.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rep = Sampling.replicateByEpochs(docs, "doc_id", "lang",
      Map("en" -> 2.5), defaultEpochs = 1.0).queryExecution.executedPlan
    assert(countExchanges(rep) == 0,
      s"replication is a per-row expression + generator, never a shuffle:\n$rep")
    val z = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(graft.operators.ZOrder.zValue($"l_partkey", $"l_suppkey", 10))
      .queryExecution.executedPlan
    assert(countExchanges(z) == 0, s"the z-value is bit math in a projection:\n$z")
  }

  test("z-order layout plans exactly one range exchange") {
    val df = (0 until 256).map(i => (i % 16, i / 16)).toDF("a", "b")
    val plan = graft.operators.ZOrder.layout(df, "a", "b", bitsPer = 4, nFiles = 4)
      .queryExecution.executedPlan
    val ranges = plan.toString.linesIterator.count(_.contains("Exchange rangepartitioning"))
    assert(ranges == 1, s"layout is one range exchange + in-partition sort:\n$plan")
  }

  test("source capping plans a map-side window group limit (q113 plan shape)") {
    // the rank<=cap filter must become WindowGroupLimit: a hot domain
    // ships only `cap` rows per input partition to the final window
    val plan = SparkEntry.queries("q113_source_cap")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"capPerStratum must prune past-cap rows before the shuffle:\n$plan")
  }

  test("unpivot is a pure map stage (q115 plan shape)") {
    val plan = SparkEntry.queries("q115_unpivot")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    assert(countExchanges(plan) == 0,
      s"wide-to-long melt must not shuffle:\n$plan")
  }

  test("time-series and graph queries never plan all-pairs joins (q110/q116)") {
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q110_gap_fill", "q116_pagerank")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q must plan equi-joins only:\n$plan")
    }
  }

  test("rolling window reuses the daily-aggregate ordering (q111 plan shape)") {
    // two exchanges are inherent ((key,day) agg + key window); anything
    // more means the window stopped composing with the aggregate
    val plan = SparkEntry.queries("q111_rolling_window")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val hashEx = plan.toString.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 2, s"rollingDaily must plan at most 2 hash exchanges:\n$plan")
  }

  test("gopherRules is map-only: zero exchanges, one codegen span (q152)") {
    val plan = SparkEntry.queries("q152_gopher_rules")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"an eight-rule quality gate must fuse with the scan:\n$plan")
    assert(!plan.contains("Generate"),
      s"gopherRules must not explode token arrays:\n$plan")
  }

  test("madOutliers flags via broadcast stats: no corpus re-shuffle (q154)") {
    val plan = SparkEntry.queries("q154_mad_outliers")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the documents scan appears for the value-count aggregate and the
    // flag projection; the flag side must join the two one-row stats
    // frames by broadcast, never shuffle the corpus against them
    assert(!plan.contains("Exchange rangepartitioning"),
      s"madOutliers must not globally sort the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"stats frames must ride as broadcasts:\n$plan")
  }

  test("compaction rewrites a fragmented table into bounded file count") {
    val path = Files.createTempDirectory("graft-compact").toString + "/t"
    (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(20).write.parquet(path)
    assert(spark.read.parquet(path).inputFiles.length >= 20)
    Writers.compact(spark, path, targetBytes = 1L << 30)
    val after = spark.read.parquet(path)
    assert(after.inputFiles.length == 1)
    assert(after.count() == 2000)
  }

  test("bloom semi-join probes in the fact scan stage, below the join") {
    // parquet-backed fact: a LocalRelation would let the optimizer
    // evaluate the probe at plan time and hide it from the plan text
    val path = Files.createTempDirectory("graft-bloom").toString + "/fact"
    (1L to 2000L).map(i => (i, i % 97)).toDF("id", "k")
      .write.parquet(path)
    val fact = spark.read.parquet(path)
    val dim = Seq(3L, 5L, 7L).toDF("k")
    val out = graft.operators.BloomJoin.semiJoin(fact, dim, "k",
      expectedItems = 16L)
    val plan = out.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val probeLine = lines.indexWhere(_.contains("might_contain"))
    val joinLine = lines.indexWhere(_.contains("Join"))
    val factScanLine = lines.indexWhere(_.contains("parquet"))
    assert(probeLine >= 0, s"bloom probe must appear in the plan:\n$plan")
    // tree dump order: join above, probe filter below it, parquet scan
    // below the probe — the probe thins the fact stream inside the scan
    // stage, before any exchange the join needs
    assert(joinLine < probeLine && probeLine < factScanLine,
      s"probe must sit between join and fact scan:\n$plan")
  }

  test("as-of attribution and forward as-of plan the one-key-shuffle shape (q166/q177)") {
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q166_attribution", "q177_next_purchase")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan
      assert(!plan.toString.contains("SortMergeJoin") &&
        !plan.toString.contains("CartesianProduct"),
        s"$q must use the union+running-window shape, not a range probe:\n$plan")
      val hashEx = plan.toString.linesIterator
        .count(_.contains("Exchange hashpartitioning"))
      assert(hashEx <= 2, s"$q: union window + rollup only:\n$plan")
    }
  }

  test("basketPairs fans sets out map-side, never a basket self-join (q167)") {
    val plan = SparkEntry.queries("q167_basket_pairs")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"pair counts must come from the set fan-out, not a shuffled self-join:\n$plan")
  }

  test("joinSkewReport top-N is a distributed TakeOrdered, not a global sort (q173)") {
    val plan = SparkEntry.queries("q173_join_skew_report")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must plan TakeOrdered:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global sort of the key histograms:\n$plan")
  }

  test("randomProjection plans the codegen-friendly join+agg shape (q168)") {
    // the regression to guard: an unrolled d·kOut-term decimal Project
    // (blows janino's method limit → interpreted execution). The
    // codegen-safe form is posexplode → broadcast sign join → hash agg.
    val plan = SparkEntry.queries("q168_random_projection")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("Generate posexplode")
      && plan.contains("BroadcastHashJoin")
      && plan.contains("partial_sum"),
      s"projection must be the explode+join+agg shape:\n$plan")
  }

  test("bloom semi-join result is exactly the plain semi-join") {
    val fact = ((1L to 500L).map(i => (i, i % 13)) :+ ((501L, -1L)))
      .toDF("id", "k")
    val dim = Seq(0L, 4L, 12L).toDF("k")
    val bloomed = graft.operators.BloomJoin.semiJoin(fact, dim, "k", 16L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"))).toSet
    val plain = fact.join(dim, Seq("k"), "left_semi")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"))).toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty && !plain.exists(_._2 == -1L))
  }

  test("round-6 linkage/attribution/diff/patterns plan equi-joins only") {
    // the round-6 pair-forming operators all exist to AVOID quadratic
    // joins: linkage candidates only from blocking keys, attribution
    // pairs only from the user equi-join, diff from the key align,
    // sequence pairs from set fan-out. Freeze that evidence.
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q196_record_linkage", "q197_linear_attribution",
        "q199_table_diff", "q200_seq_patterns", "q205_markov_eval",
        "q211_triangle_stats", "q214_reconciliation")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q must not plan a cartesian product:\n$plan")
      // q200's single BroadcastNestedLoopJoin is the sanctioned one-row
      // totals broadcast (the Profile/Sampling metadata-crossjoin
      // pattern) — anything beyond that is a regression
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      val allowed = if (q == "q200_seq_patterns") 1 else 0
      assert(nlj <= allowed,
        s"$q plans $nlj nested-loop joins (allowed $allowed):\n$plan")
    }
  }

  test("second-wave pair/graph/phrase operators plan equi-joins only") {
    // phrase search: candidates only from (doc, pos+offset) equi-joins
    // over term-filtered postings; link prediction: wedge equi-join +
    // anti-join; segment overlap: entity-keyed pair fan-out; golden
    // record / autocorrelation: key equi-joins. The sanctioned
    // BroadcastNestedLoopJoins are the ONE-ROW metadata crossjoins
    // (seasonal grand total, KM stream-end + total, overlap universe).
    val d = "/root/testdata/sf0.001"
    val allowedOneRow = Map(
      "q224_kaplan_meier" -> 3, "q225_seasonal_index" -> 1,
      "q228_segment_overlap" -> 1)
    for (q <- Seq("q224_kaplan_meier", "q225_seasonal_index",
        "q226_autocorrelation", "q228_segment_overlap",
        "q231_phrase_search", "q232_cusum", "q233_link_prediction")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q must not plan a cartesian product:\n$plan")
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      assert(nlj <= allowedOneRow.getOrElse(q, 0),
        s"$q plans $nlj nested-loop joins (allowed ${allowedOneRow.getOrElse(q, 0)}):\n$plan")
    }
  }

  test("drift/quarantine/benford reduce before they align (round-6 plan shape)") {
    val d = "/root/testdata/sf0.001"
    // categorical drift: the only exchanges are the two count aggregates
    // and the category align — the raw scans never shuffle full rows
    val drift = SparkEntry.queries("q192_categorical_drift")(spark, d)
      .queryExecution.executedPlan
    assert(countExchanges(drift) <= 6,
      s"drift should align category-scale frames, got:\n$drift")
    // quarantine is one map-side projection: zero exchanges
    val quarantine = graft.checks.Quarantine.annotate(
      graft.sources.Tables.read(spark, d, "documents"),
      Seq("len" -> (org.apache.spark.sql.functions.col("n_chars") > 10)))
      .queryExecution.executedPlan
    assert(countExchanges(quarantine) == 0,
      s"quarantine must be map-only:\n$quarantine")
  }
}
