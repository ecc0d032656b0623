package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms expressed as fixed-point join/aggregate
  * chains over edge DataFrames — the Pregel-style "rank flows along
  * edges" pattern in plain declarative Spark.
  *
  * All rank arithmetic is FIXED-POINT INTEGER: ranks are micro-units
  * (10^6 = 1.0) carried as BIGINT, contributions use integral division
  * (`div` — floor for non-negative values, matching DuckDB's `//`), and
  * the damping factor is a percent ratio (85/100) applied as
  * multiply-then-divide. No doubles anywhere, so an oracle reproduces
  * the iteration bit-exactly — and at cluster scale the result does not
  * depend on partition count or aggregation order.
  *
  * At 100 TB: each iteration is one (edge ⨝ rank) hash join on `src`
  * plus one `dst` aggregate — the canonical distributed PageRank step.
  * The rank frame is nodes-sized (≪ edges); iterations build a
  * constant-depth lineage per round and persist intermediate ranks so
  * round k+1 does not recompute round k. Dangling nodes (no out-edges)
  * keep receiving mass but leak their own — the standard simplification;
  * renormalize downstream if a distribution is needed.
  *
  * The RETURNED frame is still persisted (that cache is what keeps the
  * last iteration from recomputing the whole chain on every downstream
  * action); call `.unpersist()` on it once consumed, or let Spark's
  * ContextCleaner release the blocks when the frame is GC'd.
  */
object Graph {

  private val Micro = 1000000L

  /** Weakly-connected components over undirected `edges` — the generic
    * face of the min-label propagation that powers near-dup clustering
    * (`DedupOps.nearDupClusters` IS this algorithm on dedup pairs; this
    * entry point serves any graph: co-purchase families, entity
    * resolution, account linking). Component id = the MINIMUM node id
    * reachable from the node. Only nodes appearing on an edge are
    * returned (isolated nodes are their own trivial components —
    * left-join them back if needed).
    *
    * Scale/convergence contract inherited: per-iteration eager
    * localCheckpoint keeps lineage flat, the label-sum invariant
    * detects the fixpoint with one scalar aggregate per round, and
    * rounds needed ≈ graph diameter (raise `maxIterations` for
    * chain-shaped graphs). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIterations: Int = 20): DataFrame =
    graft.llmdata.DedupOps.nearDupClusters(
      edges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b")),
      maxIterations)
      .select(col("doc_id").as("node_id"), col("cluster_id").as("component_id"))

  /** Incremental connected components: fold a NEW edge batch into an
    * existing (node_id, component_id) assignment without replaying the
    * full edge history — the index-maintenance twin of
    * [[connectedComponents]], for the standing near-dup/entity-graph
    * clusters a production pipeline keeps current batch over batch.
    *
    * The prior assignment is itself a set of edges (node — its
    * component label, which is a real member node, the cluster min), so
    * the union (assignment-as-edges ∪ new edges) has the SAME
    * components as (all historical edges ∪ new edges) — but with every
    * old cluster compressed to a depth-1 star. Propagation rounds
    * therefore track the diameter of the NEW merge structure, not the
    * historical graph: per-batch cost is independent of how many
    * batches came before (the [[graft.llmdata.DedupOps]] incremental
    * index discipline). Component ids stay min-stable: a merge of old
    * clusters relabels to the smallest involved id.
    *
    * Returns the FULL refreshed assignment (all old nodes + new). */
  def connectedComponentsIncremental(prevAssign: DataFrame,
      newEdges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 20): DataFrame =
    connectedComponents(
      prevAssign.select(col("node_id").as("__s"), col("component_id").as("__d"))
        .unionByName(
          newEdges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))),
      "__s", "__d", maxIterations)

  /** Up to `iterations` rounds of damped PageRank over directed `edges`
    * (columns `src`, `dst`; duplicates are collapsed). Returns
    * (node, rank_micro): rank in micro-units, initialized to 1.0 per
    * node, updated as
    * `r'(v) = (1-d) + d * Σ_{u→v} r(u) div outdeg(u)` with d =
    * `dampingPct`/100 evaluated as `(dampingPct * Σ) div 100`.
    *
    * EARLY EXIT: integer fixed-point ranks reach an EXACT fixpoint (no
    * epsilon needed); the loop stops as soon as no node's rank changed.
    * The convergence test rides the SAME job that materializes each
    * round's ranks (one `changed`-count aggregate over the persisted
    * frame — replacing the old pure-materialization `count()`), so
    * convergence detection costs zero extra jobs and a converged graph
    * stops paying per-round scheduler overhead.
    *
    * `redistributeDangling = true` adds the standard dangling-mass
    * correction for users expecting a distribution: each round, the rank
    * mass of sink nodes (no out-edges) is split evenly across all N
    * nodes (or across the SEEDS only when `teleportTo` is set — restart
    * semantics) — `r'(v) = (1-d) + d * (Σ contribs + danglingSum div N)`,
    * still all-integer (`div` floors, so a few micro-units evaporate per
    * round rather than appearing from nowhere; total mass stays within
    * N micro-units of N). Default false preserves the documented
    * leak-dangling-mass simplification (and the q116 oracle). */
  def pageRank(edges: DataFrame, iterations: Int,
               dampingPct: Int = 85,
               redistributeDangling: Boolean = false,
               weightCol: Option[String] = None,
               teleportTo: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    // weighted variant: rank flows proportionally to positive INTEGER
    // edge weights — `contrib = (rank · w) div W(u)` stays exact BIGINT
    // arithmetic (the unweighted path is weight ≡ 1, same formula).
    // Duplicate (src, dst) rows SUM their weights; keep rank·weight
    // inside BIGINT (ranks carry ~1e6·mass — fine up to ~1e12 total
    // weight per edge, far past any real co-occurrence count).
    // The edge frame is consumed by EVERY iteration's contrib join plus
    // the node-universe and out-degree builds — without materialization
    // each consumer re-derives it from the caller's lineage (for the
    // corpus bigram graph that is tokenize→explode→distinct, re-run
    // ~2 times per iteration). Persist it once (MEMORY_AND_DISK spills
    // at scale — the standard iterative-graph posture) and release it
    // before returning.
    val e = weightCol.fold(
      edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")).distinct()
        .withColumn("w", lit(1L))) { wc =>
      edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col(wc).cast("long").as("w"))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // personalized (random-walk-with-restart) variant: `teleportTo`
    // restricts BOTH the initial mass and the restart term to the seed
    // set (first column, restricted to graph nodes) — rank becomes
    // proximity-to-seeds instead of global centrality. None = every
    // node is a seed, which reduces to exactly the classic formula.
    val nodesRaw = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodes = (teleportTo match {
      case None => nodesRaw.withColumn("__seed", lit(true))
      case Some(s) =>
        val seeds = s.select(col(s.columns.head).cast("string").as("node"))
          .distinct().withColumn("__flag", lit(true))
        nodesRaw.join(Broadcasts.maybeBroadcast(seeds), Seq("node"), "left")
          .withColumn("__seed", coalesce(col("__flag"), lit(false)))
          .drop("__flag")
    }).persist() // nodes-sized; forked by every round's left join
    val nNodes = nodes.count()
    // seed count for the teleport-aware dangling redistribution (0 when
    // the seed set misses the graph entirely — mass then evaporates,
    // matching the all-zero rank vector such a seed set produces)
    lazy val nSeeds: Long =
      if (teleportTo.isDefined && redistributeDangling)
        nodes.filter(col("__seed")).count()
      else nNodes
    // nodes-scale and re-joined (broadcast) every iteration — persist so
    // iterations reuse the one aggregation instead of re-shuffling e
    val outdeg = e.groupBy(col("src")).agg(sum(col("w")).as("outdeg"))
      .persist()
    val base = when(col("__seed"), lit((100 - dampingPct) * Micro / 100))
      .otherwise(lit(0L))
    var ranks = nodes.withColumn("rank_micro",
      when(col("__seed"), lit(Micro)).otherwise(lit(0L)))
    var previous: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && iter < iterations) {
      // the rank/degree frames are nodes-sized (≪ edges): broadcast them
      // under the size gate so the edge stream never shuffles for the
      // join — at web scale the gate falls back to a hash join on src
      val contribs = e
        .join(Broadcasts.maybeBroadcast(
          ranks.select(col("node").as("src"), col("rank_micro"))), Seq("src"))
        .join(Broadcasts.maybeBroadcast(outdeg), Seq("src"))
        .select(col("dst").as("node"),
          expr("(rank_micro * w) div outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_mass"))
      // ranks IS the node universe, so folding over it (rather than
      // `nodes`) both supplies every node's row and carries last round's
      // value for the convergence test — no extra join.
      var next = ranks.select(col("node"), col("__seed"),
          col("rank_micro").as("__prev"))
        .join(contribs, Seq("node"), "left")
      if (redistributeDangling) {
        // dangling mass = rank held by nodes with NO out-edges; a
        // one-row scalar, broadcast-crossed onto every node. Under a
        // teleport set the mass returns to the SEEDS only (restart
        // semantics: a walker stuck at a sink restarts at a seed) —
        // spreading it div nNodes over all nodes would leak rank to
        // non-seeds and break random-walk-with-restart proximity.
        val danglingSum = ranks
          .join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
          .agg(coalesce(sum(col("rank_micro")), lit(0L)).as("dangling_sum"))
        val perNode =
          if (teleportTo.isDefined)
            when(col("__seed"),
              if (nSeeds > 0) expr(s"dangling_sum div ${nSeeds}L") else lit(0L))
              .otherwise(lit(0L))
          else expr(s"dangling_sum div ${nNodes}L")
        next = next.crossJoin(broadcast(danglingSum))
          .withColumn("in_mass", expr("coalesce(in_mass, 0L)") + perNode)
          .drop("dangling_sum")
      }
      val stepped = next
        .select(col("node"), col("__seed"), col("__prev"),
          (base + expr(s"($dampingPct * coalesce(in_mass, 0L)) div 100"))
            .as("rank_micro"))
        .persist()
      // one job: materializes the persisted frame AND counts changes
      val changed = stepped
        .agg(count(when(col("rank_micro") =!= col("__prev"), lit(1))).as("c"))
        .first().getLong(0)
      previous.foreach(_.unpersist(blocking = false))
      previous = Some(stepped)
      ranks = stepped.drop("__prev")
      converged = changed == 0L
      iter += 1
    }
    nodes.unpersist(blocking = false)
    e.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    ranks.drop("__seed")
  }

  /** Per-node triangle count, degree, and local clustering coefficient —
    * the cohesion profile of a similarity/co-occurrence graph (dense
    * triangles = tight near-dup families or genuinely bundled products;
    * high degree with NO triangles = hub/spam signature).
    *
    * Edges are canonicalized undirected-distinct (src < dst, self-loops
    * dropped). Triangles enumerate via the ordered 3-way equi-join
    * (a<b<c: (a,b)⋈(b,c)⋈(a,c)) so each triangle is found EXACTLY once —
    * no distinct, no double counting, never an all-pairs product; the
    * worst join fan-out is bounded by the skewest node's ordered
    * adjacency (the standard compact-forward bound). Per-node counts
    * come from exploding each triangle's three corners into one hash
    * aggregate. Coefficient `2t / (d(d-1))` is exact integers with ONE
    * division; degree-<2 nodes emit NULL (undefined, not 0 — a leaf is
    * not "uncohesive", it has no possible triangle).
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // three consumers (degree, e1/e2/e3 self-joins) — materialize the
    // canonical edge set once (eager localCheckpoint, the nearDupClusters
    // pattern and its release caveat) instead of re-shuffling per branch
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("clustering_coeff",
        when(col("degree") >= 2,
          (lit(2L) * col("n_triangles")).cast("double") /
            (col("degree") * (col("degree") - lit(1L))).cast("double")))
    out
  }

  /** k-core decomposition (fixed k): the maximal subgraph in which
    * every node keeps degree ≥ k — the standard "dense core vs
    * peripheral fluff" cut (spam rings and tight near-dup families
    * survive high-k cores; drive-by links do not). Complements
    * [[triangleStats]] (local cohesion) and [[connectedComponents]]
    * (reachability) with a global density filter.
    *
    * The classic iterative peel, in the [[connectedComponents]] shape:
    * each round recomputes degrees (one hash agg) and drops
    * under-degree nodes via two semi-joins, with an eager
    * localCheckpoint so round N's plan does not nest round N−1's; the
    * fixpoint test (edge count unchanged) rides the materializing
    * count. Rounds are bounded by the graph's degeneracy ordering —
    * tens, not thousands, on real graphs; the iteration cap is a
    * backstop that LOUDLY warns (the nearDupClusters contract) since a
    * capped exit can only OVER-include nodes.
    *
    * Returns (node, degree) of the k-core members (degree measured
    * INSIDE the core). Empty result = no k-core. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIterations: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = e.count()
    var converged = nEdges == 0L
    var iter = 0
    while (!converged && iter < maxIterations) {
      val deg = e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      val keep = deg.filter(col("degree") >= k).select("node")
      val pruned = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      val n = pruned.count()
      converged = n == nEdges
      e = pruned
      nEdges = n
      iter += 1
    }
    if (!converged)
      System.err.println(s"[graft] kCore: iteration cap $maxIterations hit " +
        "before the peel fixpoint - result may OVER-include nodes")
    e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** Degree assortativity: the Pearson correlation of endpoint degrees
    * over the (directed-both-ways) edge list — one scalar summarizing
    * whether hubs attach to hubs (r > 0, social-network shape) or to
    * leaves (r < 0, hub-and-spoke / star-spam shape). The one-look
    * complement of [[triangleStats]]' per-node cohesion.
    *
    * Built ON the engine's exact correlation machinery
    * (Profile.correlationMatrix: decimal-exact moments, one
    * single-division IEEE tree per correlation — engine-reproducible),
    * fed by the canonical edge set joined twice against the degree
    * table. Degrees are integers, so every moment is exact. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true) // degree + both-direction join consumers
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val directed = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val withDeg = directed
      .join(deg.select(col("node").as("u"), col("degree").as("deg_src")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("degree").as("deg_dst")), Seq("v"))
      .select("deg_src", "deg_dst")
    Profile.correlationMatrix(withDeg, Seq("deg_src", "deg_dst"))
  }

  /** Minimum spanning forest via Borůvka — THE parallel MSF algorithm
    * (each round every component grabs its minimum outgoing edge and
    * components contract; rounds = O(log n), each a handful of
    * equi-joins — where Kruskal's sequential sorted scan cannot
    * distribute). The backbone-extraction primitive for similarity
    * graphs: the MSF of a distance graph is single-linkage clustering's
    * dendrogram, and cutting it at a threshold is a principled
    * alternative to fixed-radius near-dup edges.
    *
    * Determinism with TIED weights: edges order by the total key
    * (w, a, b) — equivalent to perturbing ties infinitesimally, under
    * which the MSF is UNIQUE, so the result is reproducible and equals
    * Kruskal's under the same order (spec-pinned). Simultaneous
    * min-edge selection under a total order cannot create cycles (the
    * classic Borůvka argument). Parallel edges collapse to their min
    * weight; self-loops drop.
    *
    * Per round: two label joins + one per-component min (struct
    * aggregate) + a component-label contraction via
    * [[connectedComponents]] on the COMPONENT-scale merge graph —
    * never the node graph. Weights must cast to long (micro-scale
    * upstream if fractional). Returns the forest's (a, b, w) edges. */
  def minSpanningForest(edges: DataFrame, srcCol: String, dstCol: String,
                        weightCol: String,
                        maxIterations: Int = 20): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"),
        col(weightCol).cast("long").as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var comp = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var forest = e.filter(lit(false)).localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIterations) {
      val lab = e
        .join(comp.select(col("node").as("a"), col("comp").as("ca")), Seq("a"))
        .join(comp.select(col("node").as("b"), col("comp").as("cb")), Seq("b"))
        .filter(col("ca") =!= col("cb"))
      val cand = lab
        .select(col("ca").as("c"), struct(col("w"), col("a"), col("b")).as("e"))
        .unionByName(lab.select(col("cb").as("c"),
          struct(col("w"), col("a"), col("b")).as("e")))
        .groupBy(col("c")).agg(min(col("e")).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"), col("e.w").as("w"))
        .distinct() // the two merging components often pick the same edge
        .localCheckpoint(true)
      if (cand.isEmpty) done = true
      else {
        forest = forest.unionByName(cand).localCheckpoint(true)
        val compEdges = cand
          .join(comp.select(col("node").as("a"), col("comp").as("ca")), Seq("a"))
          .join(comp.select(col("node").as("b"), col("comp").as("cb")), Seq("b"))
          .select(col("ca"), col("cb"))
        val mapping = connectedComponents(compEdges, "ca", "cb")
          .select(col("node_id").as("comp"), col("component_id"))
        comp = comp.join(mapping, Seq("comp"), "left")
          .select(col("node"),
            coalesce(col("component_id"), col("comp")).as("comp"))
          .localCheckpoint(true)
        iter += 1
      }
    }
    e.unpersist()
    if (!done)
      System.err.println(s"[graft] minSpanningForest: iteration cap " +
        s"$maxIterations hit before all components merged - the result " +
        "is a partial forest")
    forest
  }

  /** Minimum hop distance from a seed set, breadth-first up to
    * `maxHops` — "everything within k links of a flagged account", the
    * blast-radius primitive behind fraud-ring expansion, abuse-cluster
    * takedowns, and influence neighborhoods. Undirected (edges
    * symmetrized); returns (node, hop) for every node reached within
    * `maxHops`, hop = the MINIMUM link count from any seed (seeds
    * themselves at hop 0).
    *
    * Frontier BFS in the [[connectedComponents]] shape: each round
    * joins ONLY the newly-reached frontier (not the accumulated set)
    * against the edge list, anti-joins out already-reached nodes, and
    * eager-localCheckpoints so round N's plan never nests round N−1's.
    * Per-round cost is |frontier|-proportional; `maxHops` bounds the
    * rounds explicitly (this is a distance cut, not a convergence
    * loop — no cap warning needed). */
  def kHopDistances(edges: DataFrame, srcCol: String, dstCol: String,
                    seeds: DataFrame, seedCol: String,
                    maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var reached = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0))
      .localCheckpoint(true)
    var frontier = reached
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier
        .join(e, frontier("node") === e("u"))
        .select(col("v").as("node")).distinct()
        .join(reached.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint(true)
      reached = reached.unionAll(next).localCheckpoint(true)
      frontier = next
    }
    e.unpersist()
    reached
  }

  /** Bounded weighted single-source(-set) shortest paths: exact
    * min-cost distances from a SEED SET over positive integer edge
    * weights, Bellman-Ford-style rounds — `dist'(v) = min(dist(v),
    * min over in-edges (dist(u) + w))` — run `maxRounds` times or to
    * the exact fixpoint, whichever first. The weighted upgrade of
    * [[kHopDistances]] (hop counts are the weight-1 special case):
    * blast-radius with COSTS, lead-time graphs, influence decay.
    *
    * Exactness/convergence: distances are BIGINTs and only ever
    * DECREASE, so Σ dist strictly decreases on every changing round —
    * the [[graft.llmdata.DedupOps.nearDupClusters]] one-aggregate
    * fixpoint test (decimal sum, overflow-safe) with the same LOUD
    * stderr signal on a cap exit (distances for nodes whose shortest
    * path uses more than `maxRounds` edges are upper bounds, not
    * final). Edges are treated as UNDIRECTED (both directions added),
    * matching kHopDistances.
    *
    * Shape: per round one frontier-scale equi-join + one dst min
    * aggregate + a full-outer merge, all eagerly checkpointed —
    * constant per-round plan depth, rounds ≈ weighted-path edge count.
    * Output: (node, dist) for REACHED nodes only. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    weightCol: String, seeds: DataFrame, seedCol: String,
                    maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"),
        col(weightCol).cast("long").as("w"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v"),
        col(weightCol).cast("long").as("w")))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    // fixpoint test: Σ dist strictly decreases while any distance
    // improves, but a round that only ADDS newly-reached nodes raises
    // it — so the stable signature is the (node count, dist sum) PAIR:
    // unchanged pair ⇒ no adds and no improvements ⇒ fixpoint. One
    // aggregate job per round (it also materializes the checkpoint).
    var prev = Option.empty[(Long, java.math.BigDecimal)]
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val cand = dist.join(e, dist("node") === e("u"))
        .select(col("v").as("node"), (col("dist") + col("w")).as("__d"))
        .groupBy(col("node")).agg(min(col("__d")).as("__d"))
      val updated = dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), col("__d")),
            coalesce(col("__d"), col("dist"))).as("dist"))
        .localCheckpoint(true)
      val row = updated.agg(count(lit(1)),
        sum(col("dist").cast("decimal(38,0)"))).first()
      val sig = (row.getLong(0), row.getDecimal(1))
      dist = updated
      converged = prev.contains(sig)
      prev = Some(sig)
      round += 1
    }
    e.unpersist()
    if (!converged)
      System.err.println(
        "WARN graft.Graph.shortestPaths: round cap " +
          s"($maxRounds) reached WITHOUT converging - distances may be " +
          "upper bounds for paths longer than the cap; raise maxRounds")
    dist
  }

  /** Synchronous label-propagation community detection, `rounds` fixed
    * rounds: every node starts as its own label; each round all nodes
    * simultaneously adopt the most frequent label among their neighbors
    * (ties → the SMALLEST label, so every round is fully
    * deterministic — the usual random-order async LPA is not
    * reproducible and has no place in an oracle-gated engine).
    * Communities = label groups after the last round.
    *
    * Fixed synchronous rounds are the honest contract: async LPA's
    * convergence is order-dependent folklore, and synchronous LPA can
    * oscillate on bipartite structures — so the operator takes `rounds`
    * explicitly and documents that callers wanting a fixpoint should
    * compare successive rounds themselves.
    *
    * Per round: one neighbor-label join (edge-scale), one
    * (node, label) count aggregate, one per-node argmax via the
    * max(struct(cnt, −label)) trick — all map-side-combining hash
    * aggregates, eager-checkpointed per round ([[connectedComponents]]
    * lineage discipline). Labels must be numeric (the tie rule
    * negates). Returns (node, label). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .unionAll(edges.select(col(dstCol).cast("long").as("u"),
        col(srcCol).cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var round = 0
    while (round < rounds) {
      labels = e
        .join(labels.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy(col("u").as("node"))
        .agg(max(struct(col("__cnt"), (-col("label")).as("__nl")))
          .as("__best"))
        .select(col("node"), (-col("__best.__nl")).as("label"))
        .localCheckpoint(true)
      round += 1
    }
    e.unpersist()
    labels
  }

  /** Neighborhood-overlap link prediction: for every non-adjacent node
    * pair sharing ≥ `minCommon` neighbors, the common-neighbor count,
    * Jaccard of neighborhoods, and preferential-attachment score — the
    * classic "who should be connected" ranking behind follow
    * recommendations and missing-edge repair in entity graphs.
    *
    * Candidates come ONLY from the wedge join (two edges sharing a
    * midpoint): pair (a, c) appears once per common neighbor b, so one
    * (a, c) count aggregate yields common counts without ever forming
    * non-wedge pairs — the same never-all-pairs discipline as the dedup
    * family. Existing edges are anti-joined out (we predict NEW links).
    * Jaccard = common / (deg_a + deg_c − common), exact BIGINTs, one
    * division. Wedge fan-out is Σ_b deg(b)² — the standard bound; cap
    * hub degrees upstream (as any production link predictor does) when
    * the graph has super-hubs. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     minCommon: Int = 1): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true) // forked by degree, wedges, and the anti-join
    val adj = e.select(col("a").as("mid"), col("b").as("leaf"))
      .unionAll(e.select(col("b").as("mid"), col("a").as("leaf")))
    val deg = adj.groupBy(col("mid").as("node"))
      .agg(count(lit(1)).as("degree"))
    val wedges = adj.as("l")
      .join(adj.as("r"),
        col("l.mid") === col("r.mid") && col("l.leaf") < col("r.leaf"))
      .groupBy(col("l.leaf").as("a"), col("r.leaf").as("b"))
      .agg(count(lit(1)).as("n_common"))
    wedges
      .join(e, Seq("a", "b"), "left_anti")
      .filter(col("n_common") >= minCommon)
      .join(deg.select(col("node").as("a"), col("degree").as("deg_a")),
        Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("deg_b")),
        Seq("b"))
      .select(col("a"), col("b"), col("n_common"), col("deg_a"), col("deg_b"),
        (col("n_common").cast("double")
          / (col("deg_a") + col("deg_b") - col("n_common")).cast("double"))
          .as("jaccard"),
        (col("deg_a") * col("deg_b")).as("pref_attachment"))
  }

  /** k-core peeling, bounded rounds — "who survives when hangers-on
    * leave?": each round drops every node whose CURRENT degree is
    * below `k`, removing its edges, which can push neighbors below the
    * bar next round; after `rounds` rounds the survivors approximate
    * the k-core (exactly the k-core once a round removes nobody — the
    * fixed-round honest contract of [[labelPropagation]]: at corpus
    * scale you budget rounds, you do not iterate to an unbounded
    * fixpoint; `converged` reports whether the LAST round was already
    * stable so the caller can see an unfinished peel loudly).
    *
    * Edges canonicalize internally (undirected, self-loops dropped,
    * duplicates collapsed). Each round is one degree aggregate + two
    * semi-joins, eagerly checkpointed so round N's plan never nests
    * round N−1's (the pageRank discipline).
    *
    * Output: (node, degree) of survivors after the final round, plus
    * the constant `converged` column. */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1,16], got $rounds")
    var e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull
        && col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .distinct()
      .localCheckpoint(true)
    var stable = false
    for (_ <- 0 until rounds if !stable) {
      val deg = e.select(col("__a").as("__n"))
        .unionAll(e.select(col("__b").as("__n")))
        .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
      val keep = deg.filter(col("__d") >= k).select(col("__n"))
        .localCheckpoint(true)
      val e2 = e
        .join(keep.withColumnRenamed("__n", "__a"), Seq("__a"), "left_semi")
        .join(keep.withColumnRenamed("__n", "__b"), Seq("__b"), "left_semi")
        .localCheckpoint(true)
      // node-scale metadata counts (the pageRank fixpoint-probe pattern)
      stable = e2.count() == e.count()
      e = e2
    }
    e.select(col("__a").as("node")).unionAll(e.select(col("__b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("degree"))
      .withColumn("converged", lit(stable))
  }
}
