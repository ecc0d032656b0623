package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numeric profile reports exact stats per column in long form") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.5), (2L, null), (2L, 4.0), (3L, 2.5)
    ).toDF("k", "v")
    val out = Profile.numeric(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out("k") == ((4L, 0L, 3L, 1.0, 3.0)))
    assert(out("v") == ((4L, 1L, 2L, 2.5, 4.0)), "nulls excluded from distinct/min/max")
  }

  test("approx tier stays within the HLL error envelope of exact") {
    val docs = spark.read.parquet(sf("lineitem"))
    val cols = Seq("l_orderkey", "l_partkey", "l_extendedprice")
    val exact = Profile.numeric(docs, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.approxNumeric(docs, cols, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) / e < 0.1,
        s"$c: approx $a vs exact $e beyond 10% (rsd=0.02 → ~2% expected)")
    }
  }

  test("histogram bins edge values exactly and drops out-of-range rows") {
    val df = Seq[java.lang.Double](0.0, 4.999999, 5.0, 9.999999, 10.0, -0.000001, 80.0, null)
      .toDF("x")
    // lo=0, width=5, 16 bins: 5.0 must land in bin 1 (edge belongs to the
    // upper bin), -1e-6 and null drop, 80 = bin 16 → out of range
    val out = Profile.histogram(df, "x", BigDecimal(0), BigDecimal(5), nBins = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(0L -> ((2L, 0.0)), 1L -> ((2L, 5.0)), 2L -> ((1L, 10.0))))
  }

  test("strings profile: nulls, distincts, length bounds, ordered top values") {
    val df = Seq(
      (Some("x"), Some("aa")),
      (Some("x"), None),
      (Some("y"), None),
      (None, Some("bb"))
    ).toDF("a", "b")
    val out = Profile.strings(df, Seq("a", "b"), topK = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap
    assert(out("a") == ((4L, 1L, 2L, 1L, 1L, "x:2,y:1")),
      s"ties and counts ordered (count desc, value asc): ${out("a")}")
    assert(out("b") == ((4L, 2L, 2L, 2L, 2L, "aa:1,bb:1")))
  }

  test("approx tier plans no Expand; exact tier does (documented cost)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val approxPlan = Profile.approxNumeric(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      "sketch profile must stay single-pass at any column count")
    val exactPlan = Profile.numeric(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct is the k-way Expand by design")
  }

  test("quantile partials: any shard split merges to the direct answer") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val direct = Profile.quantilesFromCounts(
      Profile.quantilePartial(df, "v"), Seq((1, 2), (9, 10)))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val byParity = Seq(0, 1).map(p =>
      Profile.quantilePartial(df.filter($"id" % 2 === p), "v"))
    val byRange = Seq(df.filter($"id" <= 33), df.filter($"id" > 33 && $"id" <= 66),
      df.filter($"id" > 66)).map(Profile.quantilePartial(_, "v"))
    for (shards <- Seq(byParity, byRange)) {
      val merged = Profile.quantilesFromCounts(
        Profile.mergeQuantilePartials(shards), Seq((1, 2), (9, 10)))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(merged == direct, "shard layout must not change the quantiles")
    }
  }

  test("quantile partials: merge trees compose associatively") {
    val df = (1 to 60).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "v")
    val Seq(a, b, c) = (0 until 3).map(p =>
      Profile.quantilePartial(df.filter($"id" % 3 === p), "v"))
    val flat = Profile.mergeQuantilePartials(Seq(a, b, c))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nested = Profile.mergeQuantilePartials(
      Seq(Profile.mergeQuantilePartials(Seq(a, b)), c))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flat == nested)
  }

  test("grouped quantiles match per-group direct computation") {
    val df = (1 to 90).map(i => (i.toLong, s"g${i % 3}", (i % 11).toLong))
      .toDF("id", "g", "v")
    val grouped = Profile.quantilesFromCountsBy(
      Profile.quantilePartialBy(df, "g", "v"), Seq((1, 2), (9, 10)))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Profile.quantilesFromCounts(
        Profile.quantilePartial(df.filter($"g" === g), "v"), Seq((1, 2), (9, 10)))
        .collect().map(r => (g, r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      solo.foreach { case (k, v) => assert(grouped(k) == v,
        s"group $g must be independent of the others") }
    }
  }

  test("quantile threshold is integer-exact at the boundary") {
    // values 1..4, one each: median threshold cum*2 >= 1*4 first holds
    // at value 2 (cum=2) — the lower median, no float ceil ambiguity
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val out = Profile.quantilesFromCounts(
      Profile.quantilePartial(df, "v"), Seq((1, 2), (1, 4), (1, 1)))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((1, 2)) == 2L && out((1, 4)) == 1L && out((1, 1)) == 4L)
  }

  test("paretoReport ranks by weight and flags the minimal 80% head") {
    val df = Seq(("a", 20L), ("a", 40L), ("b", 30L), ("c", 10L))
      .toDF("g", "w")
    val out = Profile.paretoReport(df, "g", "w")
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Int]("rank"), r.getAs[Double]("share"),
          r.getAs[Double]("cum_share"), r.getAs[Boolean]("in_head")))).toMap
    assert(out("a") == ((1, 0.6, 0.6, true)))
    assert(out("b") == ((2, 0.3, 0.9, true)), "crossing group stays in the head")
    assert(out("c") == ((3, 0.1, 1.0, false)))
  }

  test("correlationMatrix: perfect, inverse, constant, and NULL-listwise cases") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(3.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(2.0), Some(5.0)),
      (Some(3.0), Some(6.0), Some(1.0), Some(5.0)),
      (Some(9.0), None, Some(9.0), Some(9.0))  // dropped listwise
    ).toDF("a", "b", "c", "k")
    val out = Profile.correlationMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.getAs[java.lang.Double]("corr"))))).toMap
    assert(out.size == 6)
    // the single-division tree is deterministic but not algebraically
    // exact — ±1 comes back within a few ulps, not bit-equal to 1.0
    def near(v: Option[java.lang.Double], x: Double) =
      v.exists(d => math.abs(d - x) < 1e-12)
    assert(out(("a", "b"))._1 == 3L && near(out(("a", "b"))._2, 1.0),
      "b = 2a correlates to 1 within ulps")
    assert(near(out(("a", "c"))._2, -1.0), "c = 4-a correlates to -1")
    assert(out(("a", "k"))._2.isEmpty, "constant column has no correlation")
    assert(near(out(("b", "c"))._2, -1.0))
  }
}
