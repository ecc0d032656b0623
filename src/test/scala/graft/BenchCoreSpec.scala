package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-logic specs for the bench scheduler (VERDICT r14 #1's
  * done-bar): a fake timer injects an interference burst into pass 1
  * and the schedule must re-vote the suspects FIRST, leave zero n=1
  * medians, and describe the burst in the artifact fields. */
class BenchCoreSpec extends AnyFunSuite {

  /** Fake timer: `inflated` queries return `noisy` seconds for their
    * first `burstLen` samples, `quiet` after; everything else always
    * `quiet`. */
  private def fakeRunner(inflated: Set[String], noisy: Double,
                         quiet: Double, burstLen: Int = 1)
      : String => (Double, Option[String]) = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    name => {
      val k = seen.getOrElse(name, 0)
      seen(name) = k + 1
      val t = if (inflated(name) && k < burstLen) noisy else quiet
      (t, None)
    }
  }

  private val names = (1 to 20).map(i => f"q$i%02d")

  test("an inflated pass 1 is corrected: suspects re-vote FIRST " +
    "(before any cheap rep), reach n=3, and their medians land at " +
    "the quiet value") {
    val burst = Set("q07", "q08", "q09")
    val priors = names.map(_ -> 1.0).toMap
    val r = BenchCore.run(names, fakeRunner(burst, 60.0, 1.0),
      priors, budget = 10000.0, maxReps = 3, longQ = 5.0)
    // schedule order: all pass1, then ONLY suspect samples, before any
    // n1/reps stage touches a non-suspect query
    val stages = r.runLog.map(_._1)
    val afterPass1 = stages.dropWhile(_ == "pass1")
    assert(afterPass1.takeWhile(_ == "suspect").nonEmpty,
      s"suspects must re-vote immediately after pass 1, got $afterPass1")
    val firstNonSuspect = afterPass1.indexWhere(_ != "suspect")
    assert(afterPass1.take(firstNonSuspect).forall(_ == "suspect"))
    r.runLog.filter(_._1 == "suspect").map(_._2).foreach(q =>
      assert(burst(q), s"only burst queries re-vote as suspects, got $q"))
    burst.foreach { q =>
      assert(r.samples(q).length == 3, s"$q must reach n=3")
      assert(r.median(q) == 1.0, s"$q median must outvote the burst")
    }
    assert(r.stillSuspect.isEmpty)
  }

  test("zero n=1 medians, even when the soft budget is already " +
    "exhausted by pass 1") {
    // budget tiny: pass 1 alone (20 s) exceeds it; the mandatory n=1
    // stage must still give everyone a second sample
    val r = BenchCore.run(names, fakeRunner(Set.empty, 0, 1.0),
      priors = Map.empty, budget = 5.0, maxReps = 3, longQ = 5.0)
    names.foreach(q => assert(r.samples(q).length >= 2,
      s"$q ended with n=${r.samples(q).length}"))
  }

  test("suspects re-vote worst-ratio-first") {
    val priors = Map("q01" -> 1.0, "q02" -> 1.0, "q03" -> 1.0)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val runner: String => (Double, Option[String]) = name => {
      val k = seen.getOrElse(name, 0); seen(name) = k + 1
      val t =
        if (k > 0) 1.0
        else name match {
          case "q01" => 10.0; case "q02" => 80.0; case "q03" => 40.0
        }
      (t, None)
    }
    val r = BenchCore.run(Seq("q01", "q02", "q03"), runner, priors,
      budget = 1000.0, maxReps = 1, longQ = 5.0)
    val order = r.runLog.filter(_._1 == "suspect").map(_._2).distinct
    assert(order == Vector("q02", "q03", "q01"),
      s"worst ratio first, got $order")
  }

  test("a ≥3-query alphabetical burst lands in suspect_windows; " +
    "isolated suspects and no-prior queries do not") {
    val burst = Set("q05", "q06", "q07", "q12")
    // q08 has NO prior: it cannot be classified, but it must neither
    // break a run nor extend one's reported extent
    val priors = (names.toSet - "q08").map(_ -> 1.0).toMap
    val r = BenchCore.run(names, fakeRunner(burst, 60.0, 1.0),
      priors, budget = 10000.0, maxReps = 3, longQ = 5.0)
    assert(r.suspectWindows == Seq(("q05", "q07")),
      s"got ${r.suspectWindows}")
  }

  test("a query whose slowdown is REAL (all samples high) records its " +
    "honest median and is flagged still_suspect") {
    val priors = names.map(_ -> 1.0).toMap
    // q04 is genuinely 10× slower now: every sample reads 10
    val runner: String => (Double, Option[String]) =
      name => (if (name == "q04") 10.0 else 1.0, None)
    val r = BenchCore.run(names, runner, priors, budget = 10000.0,
      maxReps = 3, longQ = 5.0)
    assert(r.median("q04") == 10.0)
    assert(r.stillSuspect == Seq("q04"))
  }

  test("erroring queries keep their time-to-failure sample, get no " +
    "reps, and stay out of suspect stages") {
    val priors = names.map(_ -> 1.0).toMap
    val runner: String => (Double, Option[String]) =
      name => if (name == "q10") (30.0, Some("Boom")) else (1.0, None)
    val r = BenchCore.run(names, runner, priors, budget = 10000.0,
      maxReps = 3, longQ = 5.0)
    assert(r.samples("q10").length == 1)
    assert(r.errors == Map("q10" -> "Boom"))
  }

  test("parsePriors reads the queries object only (n_samples siblings " +
    "with identical keys cannot clobber medians)") {
    val json = """{"metric":"total","queries":{"q01_a":1.25,"q02_b":3.0},
      |"n_samples":{"q01_a":3,"q02_b":1},"value":4.25}"""
      .stripMargin.replace("\n", "")
    assert(BenchCore.parsePriors(json) ==
      Map("q01_a" -> 1.25, "q02_b" -> 3.0))
    assert(BenchCore.parsePriors("not json") == Map.empty)
  }

  test("mergedPrior is the running fastest-median: a polluted window " +
    "never raises it, a new query enters at its first median") {
    val old = Map("q1" -> 2.0, "q2" -> 5.0)
    val now = Map("q1" -> 9.0 /* polluted */, "q2" -> 4.0, "q3" -> 7.0)
    assert(BenchCore.mergedPrior(old, now) ==
      Map("q1" -> 2.0, "q2" -> 4.0, "q3" -> 7.0))
  }

  test("post-mandatory stages keep their shapes: short queries fill " +
    "to maxReps, 2x-disagreeing pairs and the >8 s long tail get " +
    "third samples") {
    // no priors: suspect stage disabled, so the classic stages carry
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val runner: String => (Double, Option[String]) = name => {
      val k = seen.getOrElse(name, 0); seen(name) = k + 1
      val t = name match {
        case "q01" => 1.0 // short: fills to maxReps
        case "q02" => if (k == 0) 1.0 else 9.0 // n=2 disagreement
        case "q03" => 20.0 // long tail: guaranteed third sample
        case _ => 1.0
      }
      (t, None)
    }
    val r = BenchCore.run(Seq("q01", "q02", "q03"), runner, Map.empty,
      budget = 10000.0, maxReps = 3, longQ = 5.0)
    assert(r.samples("q01").length == 3)
    assert(r.samples("q02").length == 3, "disagreement re-vote")
    assert(r.samples("q03").length == 3, "long-tail third sample")
  }
}
