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

  test("pageRank exits early at the exact integer fixpoint") {
    // A→D reaches its fixpoint at round 3 (round 1 drops A to base and
    // fills D; round 2 re-levels D; round 3 confirms no change) — asking
    // for 50 iterations must not run 50 rounds. Integer ranks make the
    // fixpoint exact, so the convergence test is equality, not epsilon.
    val e = Seq(("A", "D")).toDF("src", "dst")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = Graph.pageRank(e, iterations = 50)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      Thread.sleep(1000) // let the async listener bus drain
      // converged result = the round-2 values, held at the fixpoint
      assert(r == Map("A" -> 150000L, "D" -> 277500L))
      // 3 executed rounds cost a handful of jobs (round agg + broadcasts
      // + setup + final collect, plus the edge/outdeg cache
      // materializations added in optimization r15); 50 rounds would
      // cost ≥ 50. The bound is deliberately loose — it proves early
      // exit, not a job budget.
      assert(jobs.get() < 40,
        s"expected early exit after ~3 rounds, saw ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("redistributeDangling feeds sink mass back (hand-computed round)") {
    // N=2, D dangling with rank 1000000 at round start: each node gains
    // dangling_sum div N = 500000 in-mass.
    //   A: 150000 + 85%·500000          = 575000
    //   D: 150000 + 85%·(1000000+500000) = 1425000  (sum = 2·Micro exactly)
    val e = Seq(("A", "D")).toDF("src", "dst")
    val r = Graph.pageRank(e, iterations = 1, redistributeDangling = true)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("A" -> 575000L, "D" -> 1425000L))
  }

  test("redistributeDangling conserves total mass within floor rounding") {
    // chain with a sink: A→B→C, C dangling. Integer div floors can only
    // EVAPORATE micro-units (never mint them), a few per node per round.
    val e = Seq(("A", "B"), ("B", "C")).toDF("src", "dst")
    val total = Graph.pageRank(e, iterations = 5, redistributeDangling = true)
      .agg(org.apache.spark.sql.functions.sum("rank_micro"))
      .first().getLong(0)
    assert(total <= 3000000L && total >= 3000000L - 100L,
      s"mass must stay within floor-rounding of 3.0, got $total")
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

  test("connectedComponents signals LOUDLY when the iteration cap truncates") {
    // diameter (9) > maxIterations (3): the labels at exit are NOT a
    // fixpoint and the operator must say so on stderr — a silent cap
    // exit would hand wrong cluster ids to every dedup consumer
    val edges = (1L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    val captured =
      try {
        System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
        val out = Graph.connectedComponents(edges, "src", "dst",
          maxIterations = 3)
        val ids = out.collect().map(_.getAs[Long]("component_id")).distinct
        assert(ids.length > 1, "cap-truncated chain cannot have merged fully")
        new String(buf.toByteArray, "UTF-8")
      } finally System.setErr(old)
    assert(captured.contains("WITHOUT converging"),
      s"expected non-convergence warning on stderr, got: $captured")
  }
}
