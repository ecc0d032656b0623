package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: every SparkEntry query timed on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Design goals, in priority order (round-4 lesson: the suite grew past the
  * driver's wall-clock budget, the process was SIGKILLed mid-query, and the
  * round recorded NO bench at all — partial coverage beats a dead artifact):
  *
  *  1. COVERAGE FIRST. Pass 1 runs every query exactly once, cheapest-known
  *     risk order (alphabetical, as always), so even a budget-exhausted run
  *     has a sample for every query.
  *  2. ADAPTIVE REPS. Queries whose first rep came in under
  *     SPARK_GRAFT_BENCH_LONGQ seconds (default 5) get extra reps, up to
  *     SPARK_GRAFT_BENCH_REPS (default 3) total; queries ABOVE the
  *     threshold get exactly ONE extra sample (median-of-2 — the upper
  *     mid) so no artifact median is ever a single cold sample, without
  *     spending 2x the long tail's cost. Cheap queries are where host
  *     noise dominates and median-of-3 pays off.
  *  3. CUMULATIVE BUDGET. SPARK_GRAFT_BENCH_BUDGET seconds (default
  *     scales with the suite: max(600, 2.5·n_queries)) bounds the TIMED
  *     region: once spent, remaining extra reps are skipped (pass 1
  *     always completes — coverage wins over the budget). The JSON line
  *     prints whatever was measured either way.
  *  4. RE-VOTE ON DISAGREEMENT. A query left with exactly two samples
  *     that differ by more than 2x gets a tie-breaking third sample
  *     (worst-first, budget-permitting) — a median of two interfered
  *     samples still lies (r8: q167 recorded 9.4x its quiet median).
  *     Passes 2+ stop at 90% of budget so this stage (and the >8 s
  *     long-tail third sample after it) always has a reserved slice —
  *     r9's driver window spent the whole budget before the re-vote
  *     could fire and recorded 4 interference medians as fact.
  *  5. ERRORS ARE VISIBLE. A throwing query used to record a fast fake
  *     median and look healthy; now its first exception class lands in an
  *     "errors" map after the queries map and its timing is still reported
  *     (the time-to-failure, honest but flagged).
  *
  * Per-query value is the MEDIAN of collected samples: the host shows
  * documented firecracker-neighbor noise swinging single-run totals
  * 66→137 s at sf0.1 (NOTES.md). The total is the sum of medians — an
  * estimate of one quiet sequential pass. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val longQ = sys.env.getOrElse("SPARK_GRAFT_BENCH_LONGQ", "5").toDouble
    require(maxReps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $maxReps")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/page-cache warmup outside the timed region
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(tbl =>
        try graft.sources.Tables.read(spark, sfDir, tbl).count()
        catch { case _: Throwable => () })
    // Memoized lake fixtures model PRE-EXISTING layouts — build them
    // untimed so a rep-starved window can't fold a one-time 20-40 s
    // layout build into some query's n=1 "median" (LakeFixtures
    // scaladoc; the r12 q413 artifact).
    LakeFixtures.warmAll(spark, sfDir)
    // Identity-verification reference arms (all-pairs DTW, flat IVF)
    // run once per JVM — here, untimed, so bench reps measure the
    // production operators those arms exist to verify (CrossChecks
    // scaladoc; the correctness gate still executes every require).
    CrossChecks.warmAll(spark, sfDir)
    // dev convenience, mirroring Verify's SPARK_GRAFT_ONLY: probe a
    // subset when chasing one query's timing (the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Budget scales with suite size (r7 lesson: at 288 queries pass 1
    // ALONE consumed the fixed 360 s, so every multi-second query's
    // "median" was one cold sample and the artifact showed phantom
    // 2-4x regressions that targeted probes refuted). 2.5 s/query,
    // floored at 600 s, keeps ~2-3 samples for the sub-5 s tail —
    // where medians actually fix noise — at any suite size.
    val budget = sys.env.get("SPARK_GRAFT_BENCH_BUDGET").map(_.toDouble)
      .getOrElse(math.max(600.0, 2.5 * queries.size))

    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var spent = 0.0
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case t: Throwable =>
        if (!errors.contains(name)) errors(name) = t.getClass.getSimpleName
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      samples(name) = elapsed :: samples.getOrElse(name, Nil)
      spent += elapsed
      elapsed
    }
    // Cold-start sacrifice: the FIRST timed query used to absorb the
    // residual JVM/codegen cold cost (~5-7 s, NOTES.md) that the table
    // warmup above doesn't cover — run it once UNTIMED so pass 1's
    // first sample is warm like the rest.
    queries.headOption.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // Pass 1: one sample per query, unconditionally (coverage first).
    queries.foreach { case (name, fn) => runOnce(name, fn) }
    // Passes 2..maxReps: extra reps for short, non-erroring queries while
    // the budget holds, CHEAPEST-FIRST by pass-1 time (round-robin by
    // pass, so an early stop still leaves uniform rep counts across the
    // queries it reached). Cheapest-first is the r6 lesson: with 256
    // queries pass 1 nearly exhausted the budget, and the alphabetical
    // rep order left many sub-second queries — exactly where host noise
    // corrupts a 1-sample "median" — with phantom 2-5x regressions.
    // Cheapest-first banks the cheap queries' reps for minimal budget
    // before any multi-second query spends it.
    val byCost = queries.sortBy { case (name, _) => samples(name).last }
    // Reserve a budget slice for the post-pass stages (r9 lesson: the
    // driver window spent its whole budget in passes 1-2, the re-vote
    // never fired, and 4 artifact entries recorded interference noise
    // at 2.4-3.9x their quiet medians as fact). Passes 2..maxReps stop
    // at 90% so the disagreement re-vote and the long-tail third
    // sample ALWAYS get their slice.
    val repBudget = 0.90 * budget
    (2 to maxReps).foreach { pass =>
      byCost.foreach { case (name, fn) =>
        val first = samples(name).last // pass-1 sample (list is prepended)
        // long queries get exactly ONE extra sample (on pass 2, after
        // their first), so no artifact median is ever a single cold
        // sample; short queries keep the full rep allowance
        val eligible = first < longQ || pass == 2
        if (spent < repBudget && eligible && !errors.contains(name)) runOnce(name, fn)
      }
    }
    // Re-vote on disagreement (r8 lesson: the artifact recorded q167 at
    // 9.7 s — 9.4x its quiet-window 1.04 s — because a median of TWO
    // interfered samples still lies; the judge's re-probe refuted both
    // "regressions"). Any query whose two samples differ by more than
    // 2x gets a tie-breaking THIRD sample while the budget holds,
    // worst-disagreement-first so the most suspect medians are fixed
    // before budget runs out.
    val disputed = queries
      .filter { case (name, _) =>
        val s = samples(name)
        s.length == 2 && !errors.contains(name) &&
          s.max > 2.0 * math.max(s.min, 1e-9)
      }
      .sortBy { case (name, _) =>
        val s = samples(name); -(s.max / math.max(s.min, 1e-9))
      }
    disputed.foreach { case (name, fn) =>
      if (spent < budget) runOnce(name, fn)
    }
    // Long-tail third sample: an n=2 median of a >8 s integration
    // query (q339/q359/q358 class) is one interference event away
    // from lying even when the two samples agree within 2x — give
    // every such query a guaranteed third sample out of the reserved
    // slice (most-expensive-first: the biggest absolute distortions
    // get fixed before budget runs out).
    val longTail = queries
      .filter { case (name, _) =>
        val s = samples(name)
        s.length == 2 && !errors.contains(name) && s.min > 8.0
      }
      .sortBy { case (name, _) => -samples(name).min }
    longTail.foreach { case (name, fn) =>
      if (spent < budget) runOnce(name, fn)
    }
    val results = queries.map { case (name, _) =>
      val sorted = samples(name).sorted
      // median; for even reps this is the UPPER mid sample — deliberate
      // (noise only inflates, so the bias is toward caution)
      name -> sorted(sorted.length / 2)
    }
    // TWO artifacts (round-5 lesson — the second bench-artifact loss in a
    // row): the driver captures only a bounded TAIL (~2 KB) of stdout, and
    // the per-query map at 190 entries (~5 KB) overflowed it, so BENCH_r05
    // recorded totals but lost q100–q191's timings ("parsed": null).
    //  1. The FULL per-query map goes to a FILE (SPARK_GRAFT_BENCH_OUT,
    //     default BENCH_LOCAL.json in the repo cwd) — committed per round,
    //     it is the durable regression-tracking record.
    //  2. stdout carries ONE COMPACT summary line — totals, error map,
    //     query count, the 10 slowest queries, and the detail-file path —
    //     a few hundred bytes, parseable no matter how the tail is cut
    //     (value/spent still go last so even a truncated head leaves the
    //     totals inside the captured window).
    def f(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def jmap(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v) => k -> f(v).toString })
    // per-query sample counts, so rep coverage (cheapest-first pass
    // discipline) is auditable from the artifact itself
    val reps = jmap(queries.map { case (k, _) =>
      k -> samples(k).length.toString })
    val errs = jmap(errors.toSeq.map { case (k, v) => k -> ("\"" + v + "\"") })
    val total = results.map(_._2).sum
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val fullLine =
      s"""{"metric":"total","queries":$qs,"n_samples":$reps,"errors":$errs,"sf":"$sfDir","reps":$maxReps,"budget_sec":${f(budget)},"spent_sec":${f(spent)},"unit":"sec","value":${f(total)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // "queries" kept for driver-schema compatibility but capped to the 10
    // SLOWEST (the ones regression-watching cares about); the full map is
    // in the detail file.
    val top10 = jmap(results.sortBy(-_._2).take(10)
      .map { case (k, v) => k -> f(v).toString })
    println(s"""{"metric":"total","n_queries":${results.size},"queries":$top10,"errors":$errs,"sf":"$sfDir","reps":$maxReps,"budget_sec":${f(budget)},"detail_file":"$outFile","unit":"sec","spent_sec":${f(spent)},"value":${f(total)}}""")
    spark.stop()
  }
}
