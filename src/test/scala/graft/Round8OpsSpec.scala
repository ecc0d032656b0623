package graft

import org.apache.spark.sql.functions._

/** Round-8 guards and helpers: gini contract NULL-out, OOF null-id
  * loud failure, the score pre-quantizer, and the BIGINT output class
  * of the rank statistics (the r7 decimal-purge). */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- giniByKey contract enforcement -----------------------------------

  test("giniByKey NULLs out keys containing negative values, loudly per key") {
    val df = Seq(("ok", 10.0), ("ok", 30.0),
      ("bad", 10.0), ("bad", -5.0), ("bad", 20.0)).toDF("g", "v")
    val out = graft.operators.RankStats.giniByKey(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // clean key unaffected: exact micro total, real gini
    assert(out("ok").getLong(2) == 40000000L)
    assert(!out("ok").isNullAt(3))
    // violating key survives with total/gini NULL (n counts valid rows)
    assert(out("bad").isNullAt(2) && out("bad").isNullAt(3))
    assert(out("bad").getLong(1) == 2L)
  }

  test("giniByKey fails loudly on grid-overflow magnitudes (ANSI decimal cast)") {
    // 1e12 overflows the documented decimal(12,2) grid: under Spark's
    // default ANSI mode the cast THROWS — the loudest possible
    // contract violation, never a silent NULL group
    val df = Seq(("k", 1.0), ("k", 1.0e12)).toDF("g", "v")
    val ex = intercept[Exception] {
      graft.operators.RankStats.giniByKey(df, "g", "v").collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("Decimal(12, 2)")) ||
        mentions(t.getCause))
    assert(mentions(ex))
  }

  // ---- targetEncodeOOF null-id rejection --------------------------------

  test("targetEncodeOOF fails loudly on NULL row ids instead of a silent fold") {
    val bad = Seq((Some(1L), "a", 1.0), (None, "a", 2.0))
      .toDF("id", "cat", "y")
    val ex = intercept[Exception] {
      graft.operators.Encode.targetEncodeOOF(bad, "cat", "y", "id", 2).collect()
    }
    assert(ex.getMessage.contains("NULL id")
      || Option(ex.getCause).exists(_.getMessage.contains("NULL id")))
    // non-null ids still work
    val ok = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "cat", "y")
    assert(graft.operators.Encode
      .targetEncodeOOF(ok, "cat", "y", "id", 2).count() > 0)
  }

  // ---- quantizeScores ---------------------------------------------------

  test("quantizeScores collapses a continuous score to a bounded lattice " +
    "and prCurve runs values-scale over it") {
    // 200k distinct doubles in [0,1): raw prCurve lattice would be row
    // scale; quantized at 1e-3 it is <= 1001 thresholds
    val scores = spark.range(200000L)
      .select((col("id") % 3 === 0).as("pos"),
        (col("id").cast("double") / 200000.0).as("s"))
    assert(scores.select(col("s")).distinct().count() == 200000L)
    val q = graft.operators.Eval.quantizeScores(scores, "s", 0.001)
    val nLattice = q.select(col("s")).distinct().count()
    assert(nLattice <= 1001L, s"lattice not collapsed: $nLattice")
    val pr = graft.operators.Eval.prCurve(q, "s", col("pos"))
    assert(pr.count() == nLattice)
    // recall is monotone non-increasing in threshold (sanity of the
    // cumulated lattice)
    val rows = pr.orderBy(col("threshold").desc).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) <= b.getDouble(4) + 1e-15)
    }
    // grid chain: floor(s/g)*g exactly; NULL stays NULL
    val withNull = Seq(Some(0.12345), None).toDF("s")
    val qq = graft.operators.Eval.quantizeScores(withNull, "s", 0.001)
      .collect()
    assert(qq.exists(r => !r.isNullAt(0)
      && r.getDouble(0) == math.floor(0.12345 / 0.001) * 0.001))
    assert(qq.exists(_.isNullAt(0)))
  }

  // ---- BIGINT output class (decimal purge) ------------------------------

  test("rank statistics and kappa emit BIGINT (never decimal) compared columns") {
    import org.apache.spark.sql.types.LongType
    val df = Seq(("k", 1.0, "A"), ("k", 2.0, "B"), ("k", 3.0, "A"),
      ("k", 4.0, "B")).toDF("g", "v", "s")
    val ks = graft.operators.RankStats.ksTwoSample(df, "g", "v", col("s") === "A")
    assert(ks.schema("d_numerator").dataType == LongType)
    val mwu = graft.operators.RankStats.mannWhitneyU(df, "g", "v", col("s") === "A")
    assert(mwu.schema("u_a_doubled").dataType == LongType)
    assert(mwu.schema("u_b_doubled").dataType == LongType)
    val g = graft.operators.RankStats.giniByKey(df, "g", "v")
    assert(g.schema("total_micro").dataType == LongType)
    val kap = graft.operators.Eval.cohenKappa(
      Seq(("x", "x"), ("y", "x")).toDF("a", "b"), "a", "b")
    assert(kap.schema("chance_num").dataType == LongType)
    val srm = graft.operators.Robust.sampleRatioMismatch(
      Seq("a", "b").toDF("variant"), "variant", Seq("a" -> 1L, "b" -> 1L))
    assert(srm.schema("term_num").dataType == LongType)
    assert(srm.schema("term_den").dataType == LongType)
    val tv = graft.checks.Drift.totalVariation(
      Seq("x").toDF("c"), Seq("x", "y").toDF("c"), col("c"))
    assert(tv.schema("tv_numerator").dataType == LongType)
  }
}
