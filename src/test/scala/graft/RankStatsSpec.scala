package graft

import org.apache.spark.sql.functions._
import graft.operators.RankStats

class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("ksTwoSample: hand-computed D on a tied lattice; disjoint supports hit 1") {
    // A = [1,2,2,3], B = [2,3,3,4]: CDF gaps (in 1/16ths) peak at v=2
    val df = Seq(("k", 1, "A"), ("k", 2, "A"), ("k", 2, "A"), ("k", 3, "A"),
      ("k", 2, "B"), ("k", 3, "B"), ("k", 3, "B"), ("k", 4, "B"))
      .toDF("g", "v", "s")
    val r = RankStats.ksTwoSample(df, "g", "v", col("s") === "A").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 8L) // |cumA*nB - cumB*nA| at v=2
    assert(r.getDouble(4) == 0.5)
    // disjoint supports: D = 1 exactly
    val dj = Seq(("k", 1, "A"), ("k", 2, "A"), ("k", 9, "B"))
      .toDF("g", "v", "s")
    assert(RankStats.ksTwoSample(dj, "g", "v", col("s") === "A")
      .head().getDouble(4) == 1.0)
  }

  test("ksTwoSample drops keys where either sample is empty") {
    val df = Seq(("k", 1, "A"), ("k", 2, "A")).toDF("g", "v", "s")
    assert(RankStats.ksTwoSample(df, "g", "v", col("s") === "A").count() == 0)
  }

  test("mannWhitneyU: separation, average-rank ties, and the U_A + U_B identity") {
    // full separation: all A below B -> U_A = 0
    val sep = Seq(("k", 1.0, "A"), ("k", 2.0, "A"), ("k", 3.0, "B"), ("k", 4.0, "B"))
      .toDF("g", "v", "s")
    val r1 = RankStats.mannWhitneyU(sep, "g", "v", col("s") === "A").head()
    assert(r1.getLong(3) == 0L)
    assert(r1.getLong(4) == 8L) // 2*nA*nB
    // tie across samples: A=[1,2], B=[2,3] -> R_A = 3.5, U_A = 0.5
    val tie = Seq(("k", 1.0, "A"), ("k", 2.0, "A"), ("k", 2.0, "B"), ("k", 3.0, "B"))
      .toDF("g", "v", "s")
    val r2 = RankStats.mannWhitneyU(tie, "g", "v", col("s") === "A").head()
    assert(r2.getLong(3) == 1L) // 2*U_A
    assert(r2.getLong(4) == 7L)
  }

  test("giniByKey: uniform -> 0, one-holder -> (n-1)/n, tie-order invariant") {
    val uni = Seq(("k", 10.0), ("k", 10.0), ("k", 10.0), ("k", 10.0)).toDF("g", "v")
    assert(RankStats.giniByKey(uni, "g", "v").head().getDouble(3) == 0.0)
    val one = Seq(("k", 0.0), ("k", 0.0), ("k", 0.0), ("k", 100.0)).toDF("g", "v")
    assert(RankStats.giniByKey(one, "g", "v").head().getDouble(3) == 0.75)
    // zero total -> NULL gini, not a division blowup
    val z = Seq(("k", 0.0), ("k", 0.0)).toDF("g", "v")
    assert(RankStats.giniByKey(z, "g", "v").head().isNullAt(3))
  }

  test("spearmanByKey: monotone -> +-1 (to sqrt roundoff); constant side -> NULL") {
    // num/(sqrt(d)*sqrt(d)) is one ulp off exact 1 — deterministic (the
    // oracle runs the identical IEEE tree) but not literally 1.0
    val up = Seq(("k", 1.0, 10.0), ("k", 2.0, 20.0), ("k", 3.0, 30.0),
      ("k", 4.0, 45.0)).toDF("g", "x", "y")
    assert(math.abs(RankStats.spearmanByKey(up, "g", "x", "y")
      .head().getDouble(2) - 1.0) < 1e-12)
    val dn = Seq(("k", 1.0, 45.0), ("k", 2.0, 30.0), ("k", 3.0, 20.0),
      ("k", 4.0, 10.0)).toDF("g", "x", "y")
    assert(math.abs(RankStats.spearmanByKey(dn, "g", "x", "y")
      .head().getDouble(2) + 1.0) < 1e-12)
    val const = Seq(("k", 1.0, 5.0), ("k", 2.0, 5.0)).toDF("g", "x", "y")
    assert(RankStats.spearmanByKey(const, "g", "x", "y").head().isNullAt(2))
  }

  test("KS/MWU/Gini agree with brute-force references on a hashed fixture") {
    // deterministic pseudorandom data (md5-derived, no rand()): 200
    // rows, values on a small tied grid, ~half in each sample
    def h(i: Int, salt: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i#$salt".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val rows = (1 to 200).map(i => (h(i, "v") % 13, h(i, "s") % 2 == 0))
    val df = rows.map { case (v, a) => ("k", v, a) }.toDF("g", "v", "a")
    val as = rows.filter(_._2).map(_._1.toDouble).sorted
    val bs = rows.filterNot(_._2).map(_._1.toDouble).sorted
    // brute KS
    val grid = (as ++ bs).distinct
    def cdf(xs: Seq[Double], v: Double) = xs.count(_ <= v)
    val dNum = grid.map(v =>
      math.abs(cdf(as, v).toLong * bs.size - cdf(bs, v).toLong * as.size)).max
    val ks = RankStats.ksTwoSample(df, "g", "v", col("a")).head()
    assert(ks.getLong(3) == dNum)
    // brute MWU: 2*U_A = sum over pairs of 2*[a>b] + 1*[a==b]
    val u2 = (for (x <- as; y <- bs) yield
      if (x > y) 2L else if (x == y) 1L else 0L).sum
    val mwu = RankStats.mannWhitneyU(df, "g", "v", col("a")).head()
    assert(mwu.getLong(3) == u2)
    // brute Gini on the doubled-sum identity (micro units cancel)
    val all = rows.map(_._1.toDouble).sorted
    val n = all.size
    val twoIx = all.zipWithIndex.map { case (x, i) => 2.0 * (i + 1) * x }.sum
    val tot = all.sum
    val expected = (twoIx - (n + 1) * tot) / (n * tot)
    val g = RankStats.giniByKey(df.select(col("g"), col("v").cast("double").as("v")),
      "g", "v").head()
    assert(math.abs(g.getDouble(3) - expected) < 1e-12,
      s"gini ${g.getDouble(3)} vs brute $expected")
  }

  test("RankStats windows run on distinct-value frames only (plan shape)") {
    // every window in all four plans must be key-partitioned AND sit
    // over an Aggregate child — the raw fact stream is reduced by a
    // hash aggregate BEFORE any window touches it (the 100 TB shape)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    val df = Seq(("k", 1.0, 2.0, "A")).toDF("g", "x", "y", "s")
    val plans = Seq(
      RankStats.ksTwoSample(df, "g", "x", col("s") === "A"),
      RankStats.mannWhitneyU(df, "g", "x", col("s") === "A"),
      RankStats.giniByKey(df, "g", "x"),
      RankStats.spearmanByKey(df, "g", "x", "y")).map(_.queryExecution.optimizedPlan)
    plans.foreach { p =>
      val ws = p.collect { case w: LW => w }
      assert(ws.nonEmpty)
      ws.foreach { w =>
        assert(w.partitionSpec.nonEmpty, s"unpartitioned window:\n$w")
        assert(w.collectFirst { case a: Aggregate => a }.isDefined,
          s"window over an un-aggregated frame:\n$w")
      }
    }
  }
}
