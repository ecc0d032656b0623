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
}
