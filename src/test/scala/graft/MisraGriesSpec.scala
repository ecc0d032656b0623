package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._

/** Misra-Gries mergeable heavy-hitter partials: compression algebra, the
  * N/(capacity+1) underestimate bound, guaranteed retention of heavy
  * items, and merge ≡ direct in the exactness regime. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("compress is identity at-or-under capacity") {
    val m = Map("a" -> 3L, "b" -> 2L)
    assert(MisraGries.compress(m, 2) == m)
    assert(MisraGries.compress(m, 5) == m)
  }

  test("compress subtracts the (capacity+1)-th largest weight and drops zeros") {
    // weights 5,3,2 at capacity 2: kth = 2, so a -> 3, b -> 1, c dropped
    val out = MisraGries.compress(Map("a" -> 5L, "b" -> 3L, "c" -> 2L), 2)
    assert(out == Map("a" -> 3L, "b" -> 1L))
    // all-tied weights compress to empty (value-based subtraction, so no
    // item-order dependence decides survivors)
    assert(MisraGries.compress(Map("a" -> 2L, "b" -> 2L, "c" -> 2L), 2).isEmpty)
  }

  test("mgAgg honors the underestimate bound and retains guaranteed heavy items") {
    // stream: x1 x50, x2 x30, x3 x20, plus 40 distinct singletons;
    // N = 140, capacity 9 -> bound N/(cap+1) = 14
    val items = Seq.fill(50)("x1") ++ Seq.fill(30)("x2") ++ Seq.fill(20)("x3") ++
      (1 to 40).map(i => s"s$i")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    val cap = 9
    val row = items.toDF("item")
      .select(MisraGries.mgAgg(cap, map(col("item"), lit(1L))).as("mg"))
      .head()
    val mg = row.getMap[String, Long](0).toMap
    assert(mg.size <= cap)
    val bound = n / (cap + 1) // 14
    mg.foreach { case (k, w) =>
      assert(w <= truth(k), s"$k overestimated: $w > ${truth(k)}")
      assert(truth(k) - w <= bound, s"$k under by more than $bound")
    }
    // every item with true count > bound must be present
    Seq("x1", "x2", "x3").foreach(k => assert(mg.contains(k), s"$k missing"))
  }

  test("merged partials stay within the bound of the union's truth") {
    // two halves, each with its own heavy item plus singleton noise;
    // capacity 4 forces decrements both in-partial and at merge
    val h1 = Seq.fill(30)("hot1") ++ (1 to 20).map(i => s"a$i")
    val h2 = Seq.fill(25)("hot2") ++ (1 to 20).map(i => s"b$i")
    val cap = 4
    def partial(xs: Seq[String]) = xs.toDF("item")
      .select(lit(java.sql.Date.valueOf("2024-01-01")).as("day"),
        map(col("item"), lit(1L)).as("mg"))
      .groupBy("day").agg(MisraGries.mgAgg(cap, col("mg")).as("mg"))
    val merged = MisraGries.mergeTopK(Seq(partial(h1), partial(h2)), cap)
      .head().getMap[String, Long](1).toMap
    val n = h1.size + h2.size // 95
    val bound = n / (cap + 1) // 19
    val truth = (h1 ++ h2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(merged.size <= cap)
    merged.foreach { case (k, w) =>
      assert(w <= truth(k) && truth(k) - w <= bound, s"$k: $w vs ${truth(k)}")
    }
    assert(merged.contains("hot1") && merged.contains("hot2"))
  }

  test("exactness regime: merge of disjoint partials equals the direct aggregate") {
    val ts = Seq(
      ("2024-01-01 03:00:00", "click"), ("2024-01-01 04:00:00", "view"),
      ("2024-01-01 05:00:00", "click"), ("2024-01-01 06:00:00", "buy"),
      ("2024-01-02 03:00:00", "view"), ("2024-01-02 04:00:00", "view"),
      ("2024-01-02 05:00:00", "click"))
      .map { case (t, e) => (java.sql.Timestamp.valueOf(t), e) }
    val df = ts.zipWithIndex.map { case ((t, e), i) => (i.toLong, t, e) }
      .toDF("event_id", "ts", "event_type")
    val cap = 8 // > 3 distinct items: no decrement ever fires
    val parts = Seq(
      MisraGries.dailyTopKPartial(df.filter($"event_id" % 2 === 0), "ts", "event_type", cap),
      MisraGries.dailyTopKPartial(df.filter($"event_id" % 2 === 1), "ts", "event_type", cap))
    val got = MisraGries.finishTopK(MisraGries.mergeTopK(parts, cap), k = 10)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    val want = Set(
      ("2024-01-01", "click", 2L, 1), ("2024-01-01", "buy", 1L, 2),
      ("2024-01-01", "view", 1L, 3),
      ("2024-01-02", "view", 2L, 1), ("2024-01-02", "click", 1L, 2))
    assert(got == want)
  }
}
