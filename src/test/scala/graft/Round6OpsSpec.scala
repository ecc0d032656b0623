package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.checks.{Drift, Quarantine}
import graft.operators.{Attribution, Diff, Linkage, Patterns, Profile, Timeseries}

/** Round-6 operator family: drift detection, quarantine routing, record
  * linkage, multi-touch attribution, snapshot diff, sequential patterns,
  * FD/JSON profiling, rank normalization, burst detection, LSH recall. */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Drift ------------------------------------------------------------

  private lazy val refCat = Seq("A", "A", "A", "B").toDF("c")
  private lazy val curCat = Seq("A", "B", "B", "C").toDF("c")

  test("categoricalDrift aligns categories full-outer and computes exact counts") {
    val out = Drift.categoricalDrift(refCat, curCat, col("c"))
      .orderBy("category").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("A", 3L, 1L), ("B", 1L, 2L), ("C", 0L, 1L)))
    val a = out(0)
    assert(a.getDouble(3) == 0.75 && a.getDouble(4) == 0.25) // shares
    // chi2 for A: E = 3*4/4 = 3; (1-3)^2/3 = 4/3
    assert(math.abs(a.getDouble(6) - 4.0 / 3.0) < 1e-12)
    // C is new in cur: ref_cnt 0 -> chi2 NULL
    assert(out(2).isNullAt(6))
  }

  test("totalVariation is 0 on identical mixes, 1 on disjoint supports") {
    val same = Drift.totalVariation(refCat, refCat, col("c")).head()
    assert(same.getAs[Double]("tv_distance") == 0.0)
    val disj = Drift.totalVariation(
      Seq("A", "A").toDF("c"), Seq("B", "C").toDF("c"), col("c")).head()
    assert(disj.getAs[Double]("tv_distance") == 1.0)
  }

  test("numericDrift bins with -1/nBins sentinels and NULL passthrough") {
    val ref = Seq[Option[Double]](Some(1.0), Some(5.0), Some(25.0)).toDF("v")
    val cur = Seq[Option[Double]](Some(-3.0), Some(100.0), None).toDF("v")
    val bins = Drift.numericDrift(ref, cur, col("v"), lo = 0.0, width = 10.0,
        nBins = 3)
      .select("bin", "ref_cnt", "cur_cnt").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    assert(bins == Set(
      (Some(0L), 2L, 0L),   // 1.0, 5.0
      (Some(2L), 1L, 0L),   // 25.0
      (Some(-1L), 0L, 1L),  // -3.0 below lo
      (Some(3L), 0L, 1L),   // 100.0 at/above hi (nBins sentinel)
      (None, 0L, 1L)))      // NULL
  }

  test("psiReport matches a hand-computed PSI within tolerance") {
    val out = Drift.psiReport(refCat, curCat, col("c"))
      .orderBy("category").collect()
    // A: (0.25-0.75)*ln(0.25/0.75)
    val expA = (0.25 - 0.75) * math.log(0.25 / 0.75)
    assert(math.abs(out(0).getAs[Double]("psi_contribution") - expA) < 1e-12)
    // C: ref share floored at eps -> finite, positive
    val psiC = out(2).getAs[Double]("psi_contribution")
    assert(psiC > 0 && java.lang.Double.isFinite(psiC))
  }

  // ---- Quarantine -------------------------------------------------------

  test("quarantine reasons join failed checks in declaration order; split routes") {
    val df = Seq((1, 50, "en"), (2, 500, "xx"), (3, 5, "yy")).toDF("id", "len", "lang")
    val checks = Seq(
      "len_ok" -> col("len").between(10, 100),
      "lang_ok" -> col("lang").isin("en", "de"))
    val ann = Quarantine.annotate(df, checks).orderBy("id").collect()
    assert(ann(0).isNullAt(3))                                  // clean
    assert(ann(1).getString(3) == "len_ok,lang_ok")             // both fail
    assert(ann(2).getString(3) == "len_ok,lang_ok")
    val (clean, bad) = Quarantine.split(df, checks)
    assert(clean.count() == 1 && bad.count() == 2)
    assert(!clean.columns.contains("quarantine_reasons"))
  }

  test("quarantine treats NULL predicate results as failures") {
    val df = Seq[(Int, Option[Int])]((1, None), (2, Some(50))).toDF("id", "len")
    val ann = Quarantine.annotate(df, Seq("len_ok" -> (col("len") > 10)))
      .orderBy("id").collect()
    assert(ann(0).getString(2) == "len_ok") // NULL > 10 is not a pass
    assert(ann(1).isNullAt(2))
  }

  // ---- Linkage ----------------------------------------------------------

  test("linkage scores with levenshtein falloff inside blocks only") {
    val left = Seq((1L, 10, "alice"), (2L, 10, "bob"), (3L, 20, "alice"))
      .toDF("lid", "block", "name")
    val right = Seq((101L, 10, "alice"), (102L, 10, "alicx"), (103L, 20, "bob"))
      .toDF("rid", "block", "name")
    val pairs = Linkage.linkRecords(left, right,
      blockOn = Seq("block" -> "block"),
      score = Linkage.levenshteinPoints(col("l.name"), col("r.name"), 5),
      select = Seq(col("l.lid"), col("r.rid")),
      matchAt = 5, possibleAt = 3)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getString(3))).toSet
    // (1, alice) vs block-10 rights: alice=5 match, alicx=4 possible;
    // (3, alice) is in block 20, so it never meets block-10's alice
    assert(rows == Set((1L, 101L, 5, "match"), (1L, 102L, 4, "possible")))
  }

  test("bestMatchPerLeft keeps highest score, ties to smallest right id") {
    val pairs = Seq((1L, 9L, 4, "possible"), (1L, 5L, 4, "possible"),
      (1L, 7L, 5, "match")).toDF("lid", "rid", "score", "tier")
    val best = Linkage.bestMatchPerLeft(pairs, "lid", "rid").collect()
    assert(best.length == 1 && best(0).getLong(1) == 7L)
    val tied = Linkage.bestMatchPerLeft(
      Seq((1L, 9L, 4), (1L, 5L, 4)).toDF("lid", "rid", "score"), "lid", "rid")
      .collect()
    assert(tied(0).getLong(1) == 5L)
  }

  test("equalityPoints: NULL is no evidence, not negative evidence") {
    val df = Seq[(Option[String], Option[String])](
      (Some("x"), Some("x")), (Some("x"), Some("y")), (None, Some("x")))
      .toDF("a", "b")
    val out = df.select(Linkage.equalityPoints(col("a"), col("b"), 3).as("p"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(3, 0, 0))
  }

  // ---- Multi-touch attribution ------------------------------------------

  private def ev(rows: (Long, String, String, Long)*) =
    rows.toSeq.toDF("user_id", "ts_s", "event_type", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  test("linear multiTouch splits 1e6 micro-credits, remainder to last touch") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:10:00", "click", 2L),
      (1L, "2024-01-01 10:20:00", "view", 3L),
      (1L, "2024-01-01 10:30:00", "purchase", 4L))
    val out = Attribution.multiTouch(e, "user_id", "ts", "event_type",
      "event_id", Seq("view", "click"), "purchase", lookbackSeconds = 7200L)
      .orderBy("touch_id").collect()
    assert(out.length == 3)
    val credits = out.map(r => (r.getAs[Long]("touch_id"),
      r.getAs[Long]("credit_micro"))).toSeq
    // 1e6 div 3 = 333333; remainder 1 goes to the LAST touch (id 3)
    assert(credits == Seq((1L, 333333L), (2L, 333333L), (3L, 333334L)))
    assert(credits.map(_._2).sum == 1000000L)
  }

  test("multiTouch credits organic when no touch is in the lookback window") {
    val e = ev(
      (1L, "2024-01-01 01:00:00", "view", 1L),
      (1L, "2024-01-01 10:00:00", "purchase", 2L))
    val out = Attribution.multiTouch(e, "user_id", "ts", "event_type",
      "event_id", Seq("view", "click"), "purchase", lookbackSeconds = 3600L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("channel") == "organic")
    assert(out(0).getAs[Long]("credit_micro") == 1000000L)
    assert(out(0).isNullAt(out(0).fieldIndex("touch_id")))
  }

  test("decay multiTouch weights recent touches heavier, credit still sums to 1e6") {
    val e = ev(
      (1L, "2024-01-01 09:00:00", "view", 1L),   // age 3600s = 2 half-lives
      (1L, "2024-01-01 09:45:00", "view", 2L),   // age 900s = 0 half-lives
      (1L, "2024-01-01 10:00:00", "purchase", 3L))
    val out = Attribution.multiTouch(e, "user_id", "ts", "event_type",
      "event_id", Seq("view", "click"), "purchase", lookbackSeconds = 7200L,
      halfLifeSeconds = Some(1800L), maxShift = 20)
      .orderBy("touch_id").collect()
    val c1 = out(0).getAs[Long]("credit_micro")
    val c2 = out(1).getAs[Long]("credit_micro")
    // weights 2^18 vs 2^20 -> 1:4 split = 200000 / 800000
    assert(c1 == 200000L && c2 == 800000L)
    assert(c1 + c2 == 1000000L)
  }

  test("channelCredit rolls up exact micro totals") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:30:00", "purchase", 2L),
      (2L, "2024-01-01 11:00:00", "purchase", 3L))
    val out = Attribution.channelCredit(
      Attribution.multiTouch(e, "user_id", "ts", "event_type", "event_id",
        Seq("view", "click"), "purchase", 3600L))
      .orderBy("channel").collect()
    val byCh = out.map(r => r.getString(0) ->
      (r.getAs[Long]("credit_micro"), r.getAs[Double]("credit"))).toMap
    assert(byCh("view") == ((1000000L, 1.0)))
    assert(byCh("organic") == ((1000000L, 1.0)))
  }

  // ---- Snapshot diff ----------------------------------------------------

  test("tableDiff reports added/removed/changed with per-column lists") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val nw = Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val d = Diff.tableDiff(old, nw, Seq("k")).orderBy("k").collect()
    assert(d.map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)))).toSeq == Seq(
      (2L, "changed", Some("s,v")),
      (3L, "removed", None),
      (4L, "added", None)))
  }

  test("tableDiff treats NULL<->value as a change, NULL<->NULL as equal") {
    val old = Seq[(Long, Option[String])]((1L, None), (2L, None)).toDF("k", "s")
    val nw = Seq[(Long, Option[String])]((1L, Some("x")), (2L, None)).toDF("k", "s")
    val d = Diff.tableDiff(old, nw, Seq("k")).collect()
    assert(d.length == 1 && d(0).getLong(0) == 1L
      && d(0).getString(2) == "s")
  }

  test("diffSummary groups by status and changed set") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val nw = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
    val sm = Diff.diffSummary(Diff.tableDiff(old, nw, Seq("k")))
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2))).toSet
    assert(sm == Set(("changed", Some("s"), 2L), ("added", None, 1L)))
  }

  // ---- Sequential patterns / Markov eval --------------------------------

  test("sequencePairSupport honors order and session boundaries") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "a", 1L),
      (1L, "2024-01-01 10:05:00", "b", 2L),   // a before b, same session
      (1L, "2024-01-01 12:00:00", "c", 3L),   // new session (gap > 30 min)
      (2L, "2024-01-01 10:00:00", "b", 4L),
      (2L, "2024-01-01 10:01:00", "a", 5L))   // b before a
    val out = Patterns.sequencePairSupport(e, "user_id", "ts", "event_id",
      "event_type", gapSeconds = 1800L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("a", "b") -> 1L, ("b", "a") -> 1L))
    // 3 sessions total -> support 1/3 each
  }

  test("sequencePairSupport: first-before-last catches interleaved repeats") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "b", 1L),
      (1L, "2024-01-01 10:01:00", "a", 2L),
      (1L, "2024-01-01 10:02:00", "b", 3L))  // a(10:01) precedes last b(10:02)
    val out = Patterns.sequencePairSupport(e, "user_id", "ts", "event_id",
      "event_type", 1800L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "a")))
  }

  test("markovEval: argmax prediction with lexicographic ties; unseen misses") {
    val train = ev(
      (1L, "2024-01-01 10:00:00", "a", 1L),
      (1L, "2024-01-01 10:01:00", "b", 2L),
      (1L, "2024-01-01 10:02:00", "a", 3L),
      (1L, "2024-01-01 10:03:00", "b", 4L))    // a->b twice, b->a once
    val eval = ev(
      (2L, "2024-01-01 10:00:00", "a", 5L),
      (2L, "2024-01-01 10:01:00", "b", 6L),    // a->b: hit
      (2L, "2024-01-01 10:02:00", "c", 7L),    // b->c: miss (predicted a)
      (2L, "2024-01-01 10:03:00", "d", 8L))    // c->d: unseen from_type
    val out = Patterns.markovEval(train, eval, "user_id", "ts", "event_type",
      1800L, "event_id")
      .collect().map(r => r.getString(0) -> (Option(r.getString(1)),
        r.getAs[Long]("n_hits"), r.getAs[Double]("accuracy"))).toMap
    assert(out("a") == ((Some("b"), 1L, 1.0)))
    assert(out("b") == ((Some("a"), 0L, 0.0)))
    assert(out("c") == ((None, 0L, 0.0)))
  }

  // ---- Profiling --------------------------------------------------------

  test("functionalDependencies: holds, violations, NULL-as-value branching") {
    val df = Seq[(Option[Int], Option[String])](
      (Some(1), Some("x")), (Some(1), Some("x")),
      (Some(2), Some("y")), (Some(2), None),
      (None, Some("z"))).toDF("det", "dep")
    val out = Profile.functionalDependencies(df, Seq("det" -> "dep")).head()
    assert(out.getAs[Long]("n_keys") == 2)          // NULL det excluded
    assert(out.getAs[Long]("n_violating_keys") == 1) // det=2 -> {y, NULL}
    assert(out.getAs[Long]("max_branching") == 2)
    assert(!out.getAs[Boolean]("holds"))
  }

  test("jsonKeyProfile classifies scalar classes and key presence") {
    val df = Seq(
      """{"n": 1, "s": "a", "b": true}""",
      """{"n": 2.5, "s": "b"}""",
      """{"n": 3}""").toDF("js")
    val out = Profile.jsonKeyProfile(df, "js").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_present"),
        r.getAs[String]("value_class"))).toMap
    assert(out("n") == ((3L, "mixed")))      // integer + number
    assert(out("s") == ((2L, "string")))
    assert(out("b") == ((1L, "boolean")))
    val frac = Profile.jsonKeyProfile(df, "js")
      .filter(col("key") === "b").head().getAs[Double]("present_frac")
    assert(math.abs(frac - 1.0 / 3.0) < 1e-15)
  }

  // ---- Rank normalization ----------------------------------------------

  test("quantileNormalize maps per-group positions to pos/(n+1)") {
    val df = Seq((1L, "g1", 10), (2L, "g1", 30), (3L, "g1", 20),
      (4L, "g2", 99)).toDF("id", "grp", "score")
    val out = llmdata.Sampling.quantileNormalize(df, "id", "grp", "score")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("pos"), r.getAs[Double]("quantile"))).toMap
    assert(out(1L) == ((1L, 0.25)) && out(3L) == ((2L, 0.5)) &&
      out(2L) == ((3L, 0.75)))
    assert(out(4L) == ((1L, 0.5)))  // singleton group -> 1/2
  }

  test("quantileNormalize ties break deterministically by key") {
    val df = Seq((2L, "g", 5), (1L, "g", 5)).toDF("id", "grp", "score")
    val out = llmdata.Sampling.quantileNormalize(df, "id", "grp", "score")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pos")).toMap
    assert(out(1L) == 1L && out(2L) == 2L)
  }

  // ---- Burst detection --------------------------------------------------

  test("burstDetect gap-fills buckets and flags exact 2x spikes") {
    // buckets (3600s): h0: 4 events, h1: 0 (gap), h2: 4, h3: 17
    val times = Seq.fill(4)("2024-01-01 00:10:00") ++
      Seq.fill(4)("2024-01-01 02:10:00") ++
      Seq.fill(17)("2024-01-01 03:10:00")
    val df = times.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("ts_s", "id").withColumn("ts", to_timestamp(col("ts_s")))
    val out = Timeseries.burstDetect(df, "ts", 3600L, trailingN = 24,
      factorNum = 2L, factorDen = 1L)
      .orderBy("bucket_id").collect()
    assert(out.length == 4)                       // h1 gap-filled
    assert(out(1).getAs[Long]("cnt") == 0L)
    assert(!out(0).getAs[Boolean]("is_burst"))    // no baseline yet
    // h2: baseline {4, 0} over 2 buckets: 4*2 >= 2*4 -> burst (exactly 2x avg)
    assert(out(2).getAs[Boolean]("is_burst"))
    // h3: baseline {4,0,4}: 17*3 = 51 >= 2*8 = 16 -> burst
    assert(out(3).getAs[Boolean]("is_burst"))
    assert(math.abs(out(3).getAs[Double]("ratio") - 51.0 / 8.0) < 1e-12)
  }

  test("burstDetect: steady traffic never flags") {
    val times = (0 until 6).flatMap(h => Seq.fill(5)(f"2024-01-01 $h%02d:30:00"))
    val df = times.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("ts_s", "id").withColumn("ts", to_timestamp(col("ts_s")))
    val out = Timeseries.burstDetect(df, "ts", 3600L, 24, 2L, 1L).collect()
    assert(out.drop(1).forall(!_.getAs[Boolean]("is_burst")))
  }

  // ---- Compression-ratio quality signal ---------------------------------

  test("compressionRatio matches direct JDK deflate; repetitive < prose < noise") {
    val rep = "spam " * 200
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders far afield seeking novel provender in distant meadows " * 4
    val noise = (1 to 400).map(i =>
      Integer.toString(i * 2654435761L.toInt, 36)).mkString(" ")
    val df = Seq((1L, rep), (2L, prose), (3L, noise)).toDF("id", "text")
    val out = llmdata.TextAnalysis.compressionRatio(df, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("raw_bytes"), r.getAs[Long]("deflated_bytes"),
          r.getAs[Double]("compression_ratio"))).toMap
    // bit-exact vs a direct Deflater run
    def direct(s: String): Long = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 20)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    assert(out(1L)._2 == direct(rep))
    assert(out(2L)._2 == direct(prose))
    assert(out(1L)._3 < out(2L)._3 && out(2L)._3 < out(3L)._3)
    assert(out(1L)._1 == rep.getBytes("UTF-8").length.toLong)
  }

  test("compressionRatio: empty text yields NULL ratio, zero bytes") {
    val out = llmdata.TextAnalysis.compressionRatio(
      Seq((1L, "")).toDF("id", "text"), "id", "text").head()
    assert(out.getAs[Long]("raw_bytes") == 0L)
    assert(out.isNullAt(out.fieldIndex("compression_ratio")))
  }

  // ---- Benford ----------------------------------------------------------

  test("benfordProfile extracts first significant digits and fills absent ones") {
    val df = Seq(123.0, 19.5, 0.0072, 2000.0, 95.0, -4.0, 0.0)
      .toDF("v") // digits: 1, 1, 7, 2, 9; -4 and 0 excluded
    val out = Drift.benfordProfile(df, col("v")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"),
        r.getAs[Long]("total"))).toMap
    assert(out.keySet == (1 to 9).map(_.toString).toSet)
    assert(out("1") == ((2L, 5L)) && out("7") == ((1L, 5L)) &&
      out("2") == ((1L, 5L)) && out("9") == ((1L, 5L)))
    assert(out("3") == ((0L, 5L))) // absent digit surfaces as zero
    val row1 = Drift.benfordProfile(df, col("v"))
      .filter(col("digit") === "1").head()
    assert(row1.getAs[Double]("share") == 0.4)
    assert(math.abs(row1.getAs[Double]("expected_share") - 0.301030) < 1e-12)
  }

  // ---- Conformance ------------------------------------------------------

  test("conformanceReport flags transitions outside the whitelist") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:01:00", "click", 2L),
      (1L, "2024-01-01 10:02:00", "purchase", 3L),
      (2L, "2024-01-01 10:00:00", "purchase", 4L),
      (2L, "2024-01-01 10:01:00", "view", 5L))   // purchase->view: violation
    val out = Patterns.conformanceReport(e, "user_id", "ts", "event_type",
      1800L, "event_id", allowed = Seq("view" -> "click", "click" -> "purchase"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n"), r.getAs[Boolean]("is_allowed")))).toMap
    assert(out(("view", "click")) == ((1L, true)))
    assert(out(("click", "purchase")) == ((1L, true)))
    assert(out(("purchase", "view")) == ((1L, false)))
  }

  // ---- Column overlap / key candidates ----------------------------------

  test("columnOverlap computes jaccard and containments over distinct sets") {
    val a = Seq(1, 2, 3, 4).toDF("x")
    val b = Seq(3, 4, 5, 3).toDF("y") // distinct: {3,4,5}
    val out = Profile.columnOverlap(a, "x", b, "y").head()
    assert(out.getAs[Long]("n_a") == 4 && out.getAs[Long]("n_b") == 3)
    assert(out.getAs[Long]("n_common") == 2)
    assert(out.getAs[Double]("jaccard") == 0.4)          // 2/5
    assert(out.getAs[Double]("containment_a") == 0.5)    // 2/4
    assert(math.abs(out.getAs[Double]("containment_b") - 2.0 / 3.0) < 1e-15)
  }

  test("keyCandidates: NULL presence disqualifies, combos independent") {
    val df = Seq[(Option[Int], Option[Int])](
      (Some(1), Some(1)), (Some(1), Some(2)), (Some(2), None))
      .toDF("a", "b")
    val out = Profile.keyCandidates(df, Seq(Seq("a"), Seq("a", "b")))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_distinct"),
        r.getAs[Long]("n_null_rows"), r.getAs[Boolean]("is_key"))).toMap
    assert(out("a") == ((2L, 0L, false)))       // duplicate a=1
    assert(out("a,b") == ((3L, 1L, false)))     // unique combos but a NULL row
    val clean = Profile.keyCandidates(
      Seq((1, 1), (1, 2), (2, 1)).toDF("a", "b"), Seq(Seq("a", "b"))).head()
    assert(clean.getAs[Boolean]("is_key"))
    assert(clean.getAs[Double]("uniqueness") == 1.0)
  }

  // ---- Triangles --------------------------------------------------------

  test("triangleStats: K4 gives 3 triangles/node, coeff 1; bridge node 0") {
    // complete graph on {1,2,3,4} plus a pendant 4-5 bridge
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (2L, 1L) /* dup reversed */).toDF("src", "dst")
    val out = graft.operators.Graph.triangleStats(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"),
        Option(r.get(r.fieldIndex("clustering_coeff"))).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(1L) == ((3L, 3L, Some(1.0))))
    assert(out(2L) == ((3L, 3L, Some(1.0))))
    assert(out(4L) == ((4L, 3L, Some(0.5))))   // 3 of C(4,2)=6 closed
    assert(out(5L) == ((1L, 0L, None)))        // degree < 2: undefined
    // global triangle total = sum/3 = 4 (the K4's four faces)
    assert(out.values.map(_._2).sum == 12L)
  }

  test("triangleStats: triangle-free path graph counts zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = graft.operators.Graph.triangleStats(edges, "src", "dst").collect()
    assert(out.forall(_.getAs[Long]("n_triangles") == 0L))
  }

  // ---- Dwell times ------------------------------------------------------

  test("dwellTimes: gap to next in-session event; final events censored") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:00:30", "click", 2L),
      (1L, "2024-01-01 10:02:30", "purchase", 3L), // view dwell 30s, click 120s
      (1L, "2024-01-01 12:00:00", "view", 4L))     // new session, censored
    val out = graft.operators.Sessionize.dwellTimes(e, "user_id", "ts",
      "event_type", 1800L, "event_id")
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_events"),
        r.getAs[Long]("total_dwell_us"), r.getAs[Double]("mean_dwell_s"))).toMap
    assert(out("view") == ((1L, 30000000L, 30.0)))   // session-2 view censored
    assert(out("click") == ((1L, 120000000L, 120.0)))
    assert(!out.contains("purchase"))                // always final
  }

  // ---- A/B chi-square ---------------------------------------------------

  test("abChiSquare matches the textbook 2x2 statistic") {
    // A: 100 units 30 conv; B: 100 units 10 conv
    val units = ((1 to 100).map(i => ("A", if (i <= 30) 1 else 0)) ++
      (1 to 100).map(i => ("B", if (i <= 10) 1 else 0))).toDF("variant", "conv")
    val out = graft.operators.Robust.abChiSquare(units, "variant", "conv").head()
    assert(out.getAs[Long]("n_a") == 100 && out.getAs[Long]("conv_a") == 30)
    assert(out.getAs[Double]("rate_a") == 0.3 && out.getAs[Double]("rate_b") == 0.1)
    // chi2 = 200*(30*90-70*10)^2/(100*100*40*160)
    val expected = 200.0 * math.pow(30.0 * 90 - 70.0 * 10, 2) /
      (100.0 * 100 * 40 * 160)
    assert(math.abs(out.getAs[Double]("chi2") - expected) < 1e-9)
    assert(out.getAs[Double]("chi2") > 3.8415) // significant at 0.05
  }

  test("abChiSquare: degenerate table (no conversions) yields NULL chi2") {
    val units = Seq(("A", 0), ("A", 0), ("B", 0)).toDF("variant", "conv")
    val out = graft.operators.Robust.abChiSquare(units, "variant", "conv").head()
    assert(out.isNullAt(out.fieldIndex("chi2")))
  }

  // ---- Reconciliation ---------------------------------------------------

  test("reconcile: matched/mismatch/missing statuses with exact decimal diff") {
    val parent = Seq((1L, 30.0), (2L, 50.0), (3L, 10.0)).toDF("k", "total")
    val child = Seq((1L, 10.0), (1L, 20.0), (2L, 49.5), (4L, 5.0))
      .toDF("k", "v")
    val out = graft.checks.Reconcile.reconcile(parent, "k", col("total"),
      child, "k", col("v"), tolerance = BigDecimal("0.25"))
      .collect().map(r => r.getLong(0) -> (r.getString(4),
        Option(r.getDecimal(3)).map(_.toPlainString))).toMap
    assert(out(1L)._1 == "matched")
    assert(out(2L) == (("mismatch", Some("0.500000"))))
    assert(out(3L)._1 == "missing_children")
    assert(out(4L)._1 == "missing_parent")
    val sm = graft.checks.Reconcile.summary(
      graft.checks.Reconcile.reconcile(parent, "k", col("total"),
        child, "k", col("v"), BigDecimal("0.25")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sm == Map("matched" -> 1L, "mismatch" -> 1L,
      "missing_children" -> 1L, "missing_parent" -> 1L))
  }

  // ---- Growth accounting ------------------------------------------------

  test("growthAccounting: new/retained/resurrected/churned identities") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view", 1L),  // u1 new on d1
      (1L, "2024-01-02 10:00:00", "view", 2L),  // u1 retained d2
      (1L, "2024-01-04 10:00:00", "view", 3L),  // u1 resurrected d4 (churned d3)
      (2L, "2024-01-02 10:00:00", "view", 4L))  // u2 new d2, churns d3
    val out = graft.operators.Retention.growthAccounting(e, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("2024-01-01") == ((1L, 1L, 0L, 0L, 0L)))
    assert(out("2024-01-02") == ((2L, 1L, 1L, 0L, 0L)))
    assert(out("2024-01-03") == ((0L, 0L, 0L, 0L, 2L)))  // both churn
    assert(out("2024-01-04") == ((1L, 0L, 0L, 1L, 0L)))
    assert(out("2024-01-05") == ((0L, 0L, 0L, 0L, 1L)))  // u1's final churn
    // identity: dau = new + retained + resurrected, every day
    out.values.foreach { case (dau, nw, ret, res, _) =>
      assert(dau == nw + ret + res) }
  }

  // ---- Weighted quantiles -----------------------------------------------

  test("weightedQuantilePartial: weighted median lands where the mass sits") {
    val df = Seq((10L, 1L), (20L, 1L), (30L, 98L)).toDF("v", "w")
    val parts = Profile.weightedQuantilePartial(df, "v", "w")
    val med = Profile.quantilesFromCounts(parts, Seq((1, 2)))
      .head()
    assert(med.getAs[Long]("quantile_value") == 30L) // 98% of mass at 30
    assert(med.getAs[Long]("n") == 100L)
    // unweighted median of the same values would be 20
    val unw = Profile.quantilesFromCounts(
      Profile.quantilePartial(df.select(col("v").as("value")), "value"),
      Seq((1, 2))).head()
    assert(unw.getAs[Long]("quantile_value") == 20L)
  }

  // ---- Assortativity ----------------------------------------------------

  test("degreeAssortativity: star graph is perfectly disassortative") {
    // hub 1 connected to leaves 2..5: every edge pairs degree 4 with 1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst")
    val r = graft.operators.Graph.degreeAssortativity(star, "src", "dst").head()
    assert(r.getAs[Long]("n") == 8L) // both directions
    assert(r.getAs[Double]("corr") == -1.0)
    // a uniform cycle has constant degree -> zero variance -> NULL corr
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = graft.operators.Graph.degreeAssortativity(cycle, "src", "dst").head()
    assert(rc.isNullAt(rc.fieldIndex("corr")))
  }

  // ---- Luhn card scan ---------------------------------------------------

  test("luhnCardScan validates checksums, not just shapes") {
    val df = Seq(
      (1L, "pay with 4532015112830366 now"),     // valid Visa test number
      (2L, "id 4532015112830367 stamp"),          // checksum off by one
      (3L, "ref 1234 too short, no runs"),
      (4L, "two: 4532015112830366 and 79927398713")) // valid 16 + valid 11? no: 11 digits < 13
      .toDF("id", "text")
    val out = llmdata.TextAnalysis.luhnCardScan(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_valid"))).toMap
    assert(out(1L) == ((1L, 1L)))
    assert(out(2L) == ((1L, 0L)))   // shape matches, checksum fails
    assert(out(3L) == ((0L, 0L)))   // no candidates, doc still reported
    assert(out(4L) == ((1L, 1L)))   // 11-digit run is below the floor
  }

  // ---- Contingency / diversity ------------------------------------------

  test("contingency: expected counts under independence, exact margins") {
    val df = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "q"))
      .toDF("a0", "b0")
    val out = Profile.contingency(df, "a0", "b0")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_obs"), r.getAs[Long]("row_total"),
          r.getAs[Long]("col_total"), r.getAs[Double]("expected"))).toMap
    assert(out(("x", "p")) == ((2L, 3L, 2L, 1.5)))  // E = 3*2/4
    assert(out(("y", "q")) == ((1L, 1L, 2L, 0.5)))
    val chi = Profile.contingency(df, "a0", "b0")
      .filter(col("a") === "x" && col("b") === "p").head()
      .getAs[Double]("chi2_contribution")
    assert(math.abs(chi - 0.25 / 1.5) < 1e-12)       // (2-1.5)^2/1.5
  }

  test("simpsonDiversity: 0 for one-note groups, rises with evenness") {
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "en"),
      ("s2", "en"), ("s2", "de"), ("s2", "fr")).toDF("src", "lang")
    val out = Profile.simpsonDiversity(df, "src", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("simpson"), r.getAs[Double]("effective_categories")))
      .toMap
    assert(out("s1") == ((0.0, 1.0)))
    assert(math.abs(out("s2")._1 - 2.0 / 3.0) < 1e-15)  // 1 - 3*(1/9)
    assert(out("s2")._2 == 3.0)                          // perfectly even
  }

  // ---- k-core / freshness -----------------------------------------------

  test("kCore peels to the dense core; pendant chains drop") {
    // K4 {1,2,3,4} with a pendant path 4-5-6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core3 = graft.operators.Graph.kCore(edges, "src", "dst", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3.keySet == Set(1L, 2L, 3L, 4L))
    assert(core3.values.forall(_ == 3L)) // K4 internal degrees
    // 2-core: the path still peels away (5 and 6 never reach degree 2)
    val core2 = graft.operators.Graph.kCore(edges, "src", "dst", k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(core2 == Set(1L, 2L, 3L, 4L))
    // k above the max degree: empty core
    assert(graft.operators.Graph.kCore(edges, "src", "dst", k = 5).count() == 0)
  }

  test("Freshness.report: exact lag vs pinned asOf, stale flag") {
    val df = Seq(("a", "2024-01-31 23:00:00"), ("a", "2024-01-30 00:00:00"),
      ("b", "2024-01-20 00:00:00")).toDF("src", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = graft.checks.Freshness.report(df, "src", "ts",
      "2024-02-01 00:00:00", maxLagSeconds = 7200L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("lag_seconds"),
          r.getAs[Boolean]("is_stale"))).toMap
    assert(out("a") == ((2L, 3600L, false)))
    assert(out("b") == ((1L, 12L * 86400L, true)))
  }

  // ---- A/B funnel -------------------------------------------------------

  test("abFunnel conditions each transition on reaching the from-step") {
    val e = ev(
      // variant 0 (users 2, 4): both view, one clicks, none purchase
      (2L, "2024-01-01 10:00:00", "view", 1L),
      (2L, "2024-01-01 10:01:00", "click", 2L),
      (4L, "2024-01-01 10:00:00", "view", 3L),
      // variant 1 (users 1, 3): both view+click, one purchases
      (1L, "2024-01-01 10:00:00", "view", 4L),
      (1L, "2024-01-01 10:01:00", "click", 5L),
      (1L, "2024-01-01 10:02:00", "purchase", 6L),
      (3L, "2024-01-01 10:00:00", "view", 7L),
      (3L, "2024-01-01 10:01:00", "click", 8L))
      .withColumn("variant", (col("user_id") % 2).cast("int"))
    val out = graft.operators.Funnel.abFunnel(e, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), "variant")
      .collect().map(r => r.getAs[Int]("step_index") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))).toMap
    // step 1 (view->click): variant 0 = 2 viewers 1 click, variant 1 = 2/2
    assert(out(1) == ((2L, 1L, 2L, 2L)))
    // step 2 (click->purchase): units ONLY those who clicked: 1 vs 2
    assert(out(2) == ((1L, 0L, 2L, 1L)))
  }

  // ---- Incremental view maintenance ------------------------------------

  test("ViewMaint.joinDelta: delta legs cover old-new, new-old and new-new") {
    val aOld = Seq((1L, "a1")).toDF("k", "av")
    val bOld = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    val dA = Seq((2L, "a2"), (3L, "a3")).toDF("k", "av")
    val dB = Seq((3L, "b3")).toDF("k", "bv")
    val delta = graft.incremental.ViewMaint
      .joinDelta(aOld, bOld, dA, dB, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // new a2 x old b2; new a3 x new b3; old a1 x nothing new for k=1
    assert(delta == Set((2L, "a2", "b2"), (3L, "a3", "b3")))
    val (view, na, nb) = graft.incremental.ViewMaint.applyBatch(
      aOld.join(bOld, Seq("k")), aOld, bOld, dA, dB, Seq("k"))
    val full = na.join(nb, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val maintained = view
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(maintained == full, "maintained view must equal full recompute")
  }

  test("ViewMaint: empty deltas are a no-op") {
    val a = Seq((1L, "a")).toDF("k", "av")
    val b = Seq((1L, "b")).toDF("k", "bv")
    val none = a.filter(lit(false))
    val noneB = b.filter(lit(false))
    assert(graft.incremental.ViewMaint
      .joinDelta(a, b, none, noneB, Seq("k")).count() == 0)
  }

  // ---- Product quantization ---------------------------------------------

  test("PQ: codebook shape, byte-scale codes, rerank recovers brute-force top-1") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings").limit(200)
    val codebook = llmdata.Similarity.pqTrain(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 16, iters = 2)
    assert(codebook.count() == 8L * 16)
    assert(codebook.select("centroid").head().getSeq[Double](0).length == 8)

    val codes = llmdata.Similarity.pqEncode(emb, "vec_id", "embedding",
      codebook, dim = 64, m = 8)
    val c0 = codes.head()
    assert(c0.getSeq[Int](1).length == 8)
    assert(codes.count() == 200L)

    val queries = emb.limit(8)
    val pq = llmdata.Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      codebook, codes, dim = 64, m = 8, k = 1, overfetch = 8)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("neighbor_id")).toMap
    val exact = llmdata.Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", k = 1)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(pq.keySet == exact.keySet)
    val hits = pq.count { case (q, n) => exact(q) == n }
    // ADC + 8x overfetch + exact rerank: most true top-1s survive
    assert(hits >= (pq.size * 2) / 3, s"recall@1 $hits/${pq.size}")
  }

  test("PQ encode is deterministic and ties break to the lowest cell") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings").limit(50)
    val cb = llmdata.Similarity.pqTrain(emb, "vec_id", "embedding", 64, 8, 4, 1)
    val a = llmdata.Similarity.pqEncode(emb, "vec_id", "embedding", cb, 64, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = llmdata.Similarity.pqEncode(emb, "vec_id", "embedding", cb, 64, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }

  // ---- LSH recall -------------------------------------------------------

  test("lshRecallReport: identical docs land in the top decile at recall 1") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, text), (2L, text),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "unrelated words entirely different content here now")).toDF("doc_id", "text")
    val out = llmdata.DedupOps.lshRecallReport(docs, "doc_id", "text")
      .collect()
    assert(out.nonEmpty)
    val top = out.find(_.getAs[Long]("j_bucket") == 10L).get
    assert(top.getAs[Long]("n_exact") == 1L && top.getAs[Long]("n_found") == 1L)
    assert(top.getAs[Double]("recall") == 1.0)
    out.foreach { r =>
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_exact"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
