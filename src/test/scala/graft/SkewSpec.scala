package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key — the shape salting exists for
  private lazy val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")

  test("saltedAgg matches the unsalted aggregate exactly") {
    val plain = skewed.groupBy($"k").agg(count(lit(1)).as("c"), exactSumOf($"v").as("s"))
    val salted = Skew.saltedAgg(skewed, Seq("k"), salts = 16,
      partial = Seq(count(lit(1)).as("c"), sum($"v".cast("decimal(20,6)")).as("s")),
      merge = Seq(sum($"c").as("c"), sum($"s").cast("double").as("s")))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  private def exactSumOf(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(20,6)")).cast("double")

  test("saltedJoin yields the same row multiset as the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k5", "B")).toDF("k", "name")
    val plain = skewed.join(dim, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).select("k", "v", "name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("joinSkewReport ranks keys by exact output contribution") {
    import org.apache.spark.sql.functions.col
    val left = Seq("hot", "hot", "hot", "k1", "k1", "k2", "only_l")
      .map(Tuple1(_)).toDF("k")
    val right = Seq("hot", "hot", "k1", "k3").map(Tuple1(_)).toDF("k")
    val out = Skew.joinSkewReport(left, right, "k", topN = 3)
      .collect().map(r => r.getAs[Int]("rank") ->
        ((r.getAs[String]("k"), r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
          r.getAs[Long]("contribution"), r.getAs[Long]("total_rows"),
          r.getAs[Double]("share")))).toMap
    // contributions: hot 3·2=6, k1 2·1=2, k2/k3/only_l 0 → total 8
    assert(out(1) == (("hot", 3L, 2L, 6L, 8L, 0.75)))
    assert(out(2) == (("k1", 2L, 1L, 2L, 8L, 0.25)))
    // rank 3 is a zero-contribution key, ties broken by key name
    assert(out(3)._1 == "k2" && out(3)._4 == 0L)
    // the diagnosed total equals the real join's row count
    assert(left.join(right, "k").count() == 8L)
  }
}
