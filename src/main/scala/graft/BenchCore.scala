package graft

/** The bench SCHEDULER, separated from Spark so its logic is
  * spec-testable with an injected fake timer (round-15, VERDICT r14
  * #1: the official r14 artifact recorded q79 at 132.5 s — 40-50× its
  * quiet median — because two host-interference bursts landed inside
  * pass 1, 212 queries ended the window with a SINGLE sample, and the
  * cheapest-first rep ordering systematically starved exactly the
  * inflated queries: an interfered sample sorts as "expensive" and is
  * last in line for the rep that would correct it).
  *
  * The fix has three parts, in schedule order:
  *
  *  1. PRIOR-INFORMED SUSPECT RE-VOTES, FIRST. The harness reads last
  *     round's committed per-query medians as a prior
  *     ([[Bench]] reads `BENCH_PRIOR.json`, a fastest-median-ever
  *     record immune to polluted windows). Immediately after pass 1,
  *     any query whose sample exceeds `suspectFactor` (2.5×) its prior
  *     is SUSPECT and is re-voted — worst-ratio-first, to n=3 so a
  *     median outvotes the bad sample — BEFORE any cheapest-first rep
  *     spends budget.
  *  2. ZERO n=1 MEDIANS, EVER. After the suspect stage, every
  *     non-erroring query still holding one sample gets a second,
  *     unconditionally. Both mandatory stages ignore the soft budget:
  *     the budget exists to finish inside the driver's wall-clock, but
  *     an interference burst inflates `spent` with time that was never
  *     honestly used — gating the correction on the inflated ledger is
  *     how r14 recorded noise as fact. They stop only at a hard cap of
  *     (pass-1 spend + one full budget), a guarantee the honest second
  *     pass (~half the budget at observed per-query cost) fits under.
  *  3. SELF-DESCRIBING ARTIFACTS. Pass-1 bursts are detected as runs
  *     of ≥3 consecutive (alphabetical) suspects and logged as
  *     `suspect_windows`; queries whose median STILL exceeds the prior
  *     after 3 samples are logged as `still_suspect` — the driver
  *     number carries its own noise diagnosis.
  *
  * Stages after the mandatory two keep their r8-r13 shapes: extra reps
  * for short queries (cheapest-first, 90%-budget so the re-vote stages
  * keep a reserved slice), the 2× disagreement re-vote, and the >8 s
  * long-tail third sample. */
object BenchCore {

  final case class Result(
      samples: Map[String, List[Double]],
      errors: Map[String, String],
      runLog: Vector[(String, String)], // (stage, query), execution order
      spent: Double,
      suspectWindows: Seq[(String, String)], // (first, last) of each burst
      stillSuspect: Seq[String]) {
    /** Per-query median: upper-mid for even n (noise only inflates, so
      * the bias is toward caution). */
    def median(name: String): Double = {
      val sorted = samples(name).sorted
      sorted(sorted.length / 2)
    }
  }

  /** Run the schedule. `runOnce(name)` executes one timed sample and
    * returns (elapsed seconds, error-class if the query threw). Sample
    * lists are PREPENDED (head = newest), matching the historical
    * layout ([[Bench]] relied on `.last` = pass-1 sample). */
  def run(names: Seq[String],
          runOnce: String => (Double, Option[String]),
          priors: Map[String, Double],
          budget: Double,
          maxReps: Int,
          longQ: Double,
          suspectFactor: Double = 2.5): Result = {
    require(maxReps >= 1, s"maxReps must be >= 1, got $maxReps")
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val runLog = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var spent = 0.0
    def sample(stage: String, name: String): Unit = {
      val (elapsed, err) = runOnce(name)
      err.foreach(e => if (!errors.contains(name)) errors(name) = e)
      samples(name) = elapsed :: samples.getOrElse(name, Nil)
      spent += elapsed
      runLog += ((stage, name))
    }
    def med(name: String): Double = {
      val sorted = samples(name).sorted
      sorted(sorted.length / 2)
    }
    def n(name: String): Int = samples.getOrElse(name, Nil).length
    def prior(name: String): Option[Double] = priors.get(name)
    def suspectNow(name: String): Boolean =
      prior(name).exists(p => med(name) > suspectFactor * math.max(p, 1e-9))

    // Pass 1: one sample per query, alphabetical order, unconditional
    // (coverage first — the r4 lesson).
    names.foreach(sample("pass1", _))

    // Burst detection over the PASS-1 samples, before any re-vote
    // muddies them: maximal runs of consecutive suspect-classified
    // queries (no-prior queries neither extend nor break a run) with
    // ≥3 members are host-interference windows, logged verbatim.
    val pass1Class: Seq[(String, Char)] = names.map { name =>
      val s = samples(name).last
      val c = prior(name) match {
        case None => 'u' // unknown — no prior to judge against
        case Some(p) =>
          if (s > suspectFactor * math.max(p, 1e-9)) 's' else 'c'
      }
      (name, c)
    }
    val suspectWindows = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var run = List.empty[String]
      def close(): Unit = {
        if (run.length >= 3) out += ((run.last, run.head))
        run = Nil
      }
      pass1Class.foreach {
        case (name, 's') => run = name :: run
        case (_, 'u') => () // keeps a run open, does not count
        case _ => close()
      }
      close()
      out.toSeq
    }

    // Mandatory stage A — suspect re-votes FIRST (VERDICT r14 #1): the
    // queries most likely to be lying get their correction before any
    // budget is spent elsewhere; worst ratio first; to n=3 so the
    // median outvotes one interfered sample. UNCONDITIONAL, not
    // budget-gated: an interference burst inflates `spent` with time
    // that was never honestly used, and gating the correction on the
    // inflated ledger is exactly how r14 recorded noise as fact. The
    // stage is bounded by construction — at most 2 extra samples per
    // suspect, and their honest cost is what the prior says it is.
    def suspects(): Seq[String] = names
      .filter(q => !errors.contains(q) && n(q) < 3 && suspectNow(q))
      .sortBy(q => -(med(q) / math.max(prior(q).get, 1e-9)))
    var round = 0
    while (suspects().nonEmpty && round < 3) {
      suspects().foreach(sample("suspect", _))
      round += 1
    }

    // Mandatory stage B — zero n=1 medians, ever (VERDICT r14 #1's
    // done-bar): every non-erroring query gets a second sample,
    // UNCONDITIONALLY (bounded by construction: one sample per query —
    // at most one more honest pass-1). Cheapest-first. Erroring
    // queries keep their time-to-failure single sample (flagged in
    // `errors`).
    names.filter(q => n(q) == 1 && !errors.contains(q))
      .sortBy(q => samples(q).last)
      .foreach(sample("n1", _))

    // Extra reps for short queries while the soft budget holds,
    // cheapest-first by pass-1 time, round-robin by pass (r6 lesson);
    // stops at 90% so the re-vote stages below keep a reserved slice
    // (r9 lesson). Long queries already hold their n=2 guarantee from
    // stage B.
    val byCost = names.sortBy(q => samples(q).last)
    val repBudget = 0.90 * budget
    (3 to maxReps).foreach { _ =>
      byCost.foreach { q =>
        val eligible = samples(q).last < longQ && n(q) < maxReps
        if (spent < repBudget && eligible && !errors.contains(q))
          sample("reps", q)
      }
    }

    // Re-vote on disagreement (r8 lesson): two samples differing by
    // more than 2× get a tie-breaking third, worst-first.
    names
      .filter { q =>
        val s = samples(q)
        s.length == 2 && !errors.contains(q) &&
          s.max > 2.0 * math.max(s.min, 1e-9)
      }
      .sortBy { q =>
        val s = samples(q); -(s.max / math.max(s.min, 1e-9))
      }
      .foreach { q => if (spent < budget) sample("dispute", q) }

    // Long-tail third sample (r13): an n=2 median of a >8 s query is
    // one interference event from lying even when the samples agree.
    names
      .filter { q =>
        val s = samples(q)
        s.length == 2 && !errors.contains(q) && s.min > 8.0
      }
      .sortBy(q => -samples(q).min)
      .foreach { q => if (spent < budget) sample("longtail", q) }

    val stillSuspect = names.filter(q => !errors.contains(q) && suspectNow(q))
    Result(samples.toMap, errors.toMap, runLog.toVector, spent,
      suspectWindows, stillSuspect)
  }

  /** Parse the `"queries":{...}` object of a bench/prior JSON artifact
    * into name→seconds. Hand-rolled (no JSON dep in the repo): the
    * object is extracted FIRST so sibling maps sharing the same query
    * keys (`n_samples`) can't clobber the medians. Returns empty on
    * any malformed input — a missing prior only disables suspect
    * detection, never the run. */
  def parsePriors(json: String): Map[String, Double] = {
    val obj = "\"queries\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse(return Map.empty)
    "\"([^\"]+)\"\\s*:\\s*([0-9][0-9.eE+-]*)".r.findAllMatchIn(obj)
      .flatMap { m =>
        try Some(m.group(1) -> m.group(2).toDouble)
        catch { case _: NumberFormatException => None }
      }.toMap
  }

  /** The prior for the NEXT window: per-query min(current median, old
    * prior) — "fastest median ever observed". A polluted window can
    * only RAISE medians, so the min is immune to exactly the artifact
    * r14 committed; a genuinely slower query is re-voted each window
    * (2 extra honest samples) and its median still records honestly. */
  def mergedPrior(oldPrior: Map[String, Double],
                  medians: Map[String, Double]): Map[String, Double] =
    medians.map { case (q, m) =>
      q -> math.min(m, oldPrior.getOrElse(q, Double.MaxValue))
    }
}
