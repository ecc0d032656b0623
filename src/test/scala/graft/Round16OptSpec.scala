package graft

import org.apache.spark.sql.functions._

/** Round-16 optimization pins: every rewrite this round must keep its
  * operator's OUTPUT byte-identical — these specs re-derive the
  * pre-rewrite semantics from first principles and require equality. */
class Round16OptSpec extends SparkSpec {
  import spark.implicits._

  /** Reference for [[graft.llmdata.DedupOps.minhashLshSets]]'s
    * PRE-round-16 semantics, computed naively in Scala: per-doc
    * 60-bit salted-md5 minima, per-doc band hashes, candidates = doc
    * pairs sharing >= 1 (band, band_hash), verified at exact set
    * jaccard, kept at >= threshold. */
  private def referenceSetPairs(memberships: Seq[(Long, String)],
                                bands: Int, rows: Int,
                                t: Double): Map[(Long, Long), Double] = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def h60(s: String, salt: String): Long =
      java.lang.Long.parseLong(md5hex(s + salt).substring(0, 15), 16)
    val sets = memberships.groupBy(_._1).map { case (id, ms) =>
      id -> ms.map(_._2).toSet
    }
    val sig = sets.map { case (id, items) =>
      id -> (0 until bands * rows).map(i =>
        items.map(s => h60(s, s"#$i")).min)
    }
    val bandHash = sig.map { case (id, hs) =>
      id -> (0 until bands).map(b =>
        md5hex((0 until rows).map(r => hs(b * rows + r).toString)
          .mkString("|")))
    }
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      if (0 until bands).exists(b => bandHash(i)(b) == bandHash(j)(b))
      inter = (sets(i) intersect sets(j)).size
      jac = inter.toDouble / (sets(i).size + sets(j).size - inter)
      if jac >= t
    } yield (i, j) -> jac).toMap
  }

  test("minhashLshSets rewrite: output equals the pre-r16 per-doc band-join " +
      "semantics on a corpus with repeated sets, subsets and dup rows") {
    // 60 docs: ids 1-20 share set {a,b,c} (the repeated-set clump the
    // dedup-first rewrite collapses), 21-30 hold {a,b,c,d} (subset
    // pairs at jaccard 3/4), 31-40 hold {a,b,x,y,z} (ratio-prefilter
    // fodder vs size-3 sets: 3/5 < 0.7), 41-60 singletons {k_i}, plus
    // duplicate membership rows sprinkled in
    val memberships: Seq[(Long, String)] =
      (1L to 20L).flatMap(i => Seq("a", "b", "c").map((i, _))) ++
        Seq((7L, "a"), (13L, "c")) ++ // duplicate rows
        (21L to 30L).flatMap(i => Seq("a", "b", "c", "d").map((i, _))) ++
        (31L to 40L).flatMap(i => Seq("a", "b", "x", "y", "z").map((i, _))) ++
        (41L to 60L).map(i => (i, s"k$i"))
    for (t <- Seq(0.5, 0.7, 0.75, 1.0)) {
      val expect = referenceSetPairs(memberships, bands = 4, rows = 4, t)
      val got = graft.llmdata.DedupOps.minhashLshSets(
        memberships.toDF("set_id", "item"), "set_id", "item",
        bands = 4, rows = 4, jaccardThreshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      assert(got.length == got.toMap.size, s"duplicate output pairs at t=$t")
      assert(got.toMap == expect, s"pair set diverged at t=$t")
    }
  }

  test("minhashLshSets: size-ratio prefilter keeps the exact-boundary pair " +
      "(min/max == threshold is a kept candidate, not a dropped one)") {
    // {a,b,c} vs {a,b,c,d,e}: jaccard = 3/5 = exactly 0.6 — the
    // subset-bound equality case the prefilter must NOT drop
    val m = (Seq("a", "b", "c").map((1L, _)) ++
      Seq("a", "b", "c", "d", "e").map((2L, _))).toDF("set_id", "item")
    val out = graft.llmdata.DedupOps.minhashLshSets(m, "set_id", "item",
      bands = 8, rows = 1, jaccardThreshold = 0.6).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 0.6)
  }
}
