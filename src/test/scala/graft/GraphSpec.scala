package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A→B, A→C, B→C, C→A; outdeg A=2, B=1, C=1. Hand-run of the
  // micro-unit update r' = 150000 + (85 * Σ(r div outdeg)) div 100:
  //   iter1: A=1000000, B=575000,  C=1425000
  //   iter2: A=1361250, B=575000,  C=1063750
  private val edges =
    Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")).toDF("src", "dst")

  test("pageRank reproduces the hand-computed fixed-point iteration") {
    val r1 = Graph.pageRank(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == Map("A" -> 1000000L, "B" -> 575000L, "C" -> 1425000L))
    val r2 = Graph.pageRank(edges, iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r2 == Map("A" -> 1361250L, "B" -> 575000L, "C" -> 1063750L))
  }

  test("duplicate edges collapse; dangling nodes keep base rank") {
    // D is a pure sink (no out-edges): it receives mass but contributes
    // none; duplicated A→D edges must not double D's in-mass
    val e = Seq(("A", "D"), ("A", "D"), ("A", "D")).toDF("src", "dst")
    val r = Graph.pageRank(e, iterations = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // A: no in-edges → 150000; D: 150000 + 85% of A's full 1000000
    assert(r == Map("A" -> 150000L, "D" -> 1000000L))
  }

  test("rank mass concentrates on the hub of a star graph") {
    val e = (1 to 5).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val r = Graph.pageRank(e, iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("hub") > r("leaf1") * 4, "hub collects every leaf's mass")
    assert((1 to 5).map(i => r(s"leaf$i")).distinct.size == 1,
      "symmetric leaves tie exactly")
  }
}
