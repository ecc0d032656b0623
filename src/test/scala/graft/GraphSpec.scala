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

  test("connectedComponents labels every node with its min reachable id") {
    // two components {1,2,3,4} (chain) and {10,11}; 20 is absent (no edge)
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("src", "dst")
    val out = Graph.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getAs[Long]("node_id") ->
        r.getAs[Long]("component_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges on a long chain within maxIterations") {
    // one-hop-per-round propagation needs diameter+1 rounds: 12 for
    // this path — inside the default 20, and the scaladoc's warning
    // case for longer chains
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Graph.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getAs[Long]("component_id")).distinct
    assert(out.toSeq == Seq(1L), "one chain, one component")
  }
}
