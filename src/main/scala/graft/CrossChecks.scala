package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Once-per-JVM identity-verification arms (round-14, VERDICT r13 #2):
  * some queries prove an INDEXED operator exact by recomputing the
  * reference form (all-pairs DTW, flat IVF) and `require`-ing
  * equality. Those reference arms are the very computation the
  * indexed operator exists to avoid — valuable as gates, pure
  * overhead as a per-rep bench cost (the q359 build/serve precedent,
  * applied to cross-checks). Each check runs AT MOST ONCE per
  * (check, sf-dir) per JVM:
  *
  *  - the correctness gate (graft.Verify, a fresh JVM per run) always
  *    executes every check — the requires still gate every round;
  *  - graft.Bench triggers them through [[warmAll]] OUTSIDE the timed
  *    region, so bench reps measure the production arm only.
  *
  * Determinism makes the memoization sound: every check verifies a
  * pure function of the sf-dir input (md5-pinned, no rand), so one
  * execution per JVM proves exactly what per-rep execution proved. */
object CrossChecks {

  private val done =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Run `check` at most once per (tag, sfDir) per JVM; concurrent
    * callers block on the first run (computeIfAbsent). A FAILED check
    * is not memoized — the exception propagates and a retry re-runs. */
  def once(tag: String, sfDir: String)(check: => Unit): Unit = {
    done.computeIfAbsent(s"$tag|$sfDir", { _ => check; "ok" })
    ()
  }

  /** q527's reference arm: a batch appended to the stored-centroid
    * IVF-PQ index, searched with an unrestricted candidate budget,
    * must equal the flat IVF index grown through the same
    * stored-centroid append path — the quantized and full-precision
    * admission ladders agree exactly. */
  def ivfPqAppendEqualsFlat(s: SparkSession, d: String): Unit =
    once("ivfPqAppendEqFlat", d) {
      import graft.llmdata.Similarity
      val emb = graft.sources.Tables.read(s, d, "embeddings")
      val b = emb.filter(col("vec_id") % 5 === 0)
      val queries = emb.filter(col("vec_id") < 16)
      val pqRoot = LakeFixtures.freshRoot("pqappendchk") + "/idx"
      LakeFixtures.copyTree(s, LakeFixtures.ivfPqCorpusA(s, d), pqRoot)
      Similarity.ivfPqIndexAppend(s, pqRoot, b, "vec_id", "embedding")
      val flatRoot = LakeFixtures.freshRoot("flatappendchk") + "/idx"
      LakeFixtures.copyTree(s, LakeFixtures.ivfFlatCorpusA(s, d),
        flatRoot)
      Similarity.ivfIndexAppend(s, flatRoot, b, "vec_id", "embedding")
      val pq = Similarity.ivfPqTopKIndexed(s, pqRoot, queries, "vec_id",
          "embedding", k = 3, nprobe = 2, overfetch = Int.MaxValue / 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .localCheckpoint(true)
      val flat = Similarity.ivfTopKIndexed(s, flatRoot, queries,
          "vec_id", "embedding", k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
      require(pq.exceptAll(flat).isEmpty && flat.exceptAll(pq).isEmpty,
        "appended IVF-PQ (unrestricted budget) must equal the " +
          "appended flat IVF at the same probes")
    }

  /** q526's reference arm: the grid-blocked exact DTW top-k must
    * equal the all-pairs pruned top-k on the same series frame. */
  def dtwBlockedEqualsAllPairs(s: SparkSession, d: String): Unit =
    once("dtwBlockedEqAllPairs", d) {
      import graft.operators.Timeseries
      val k = 2
      val series = SparkEntry.dailyCountSeries(s, d)
      val blocked = Timeseries.dtwTopKBlocked(series, "event_type",
          "x", "y", band = 5, k = k, nSeg = 7, cellCents = 10000L)
        .select("query_key", "neighbor", "rank", "dtw_cents")
      val allPairs = Timeseries.dtwTopK(series, "event_type", "x", "y",
          band = 5, k = k)
        .select("query_key", "neighbor", "rank", "dtw_cents")
      require(blocked.exceptAll(allPairs).isEmpty
          && allPairs.exceptAll(blocked).isEmpty,
        "blocked DTW top-k must equal the all-pairs pruned top-k")
    }

  /** q426's reference arm: the three-slice fold of mergeable daily
    * value-count partials must equal the one-shot partial on every
    * lattice cell. */
  def aggMergeFoldEqualsOneShot(s: SparkSession, d: String): Unit =
    once("aggMergeFoldEqOneShot", d) {
      import graft.operators.AggMerge
      val folded = SparkEntry.mergedDailyValueCounts(s, d)
      val one = AggMerge.dailyValuePartial(
        graft.sources.Tables.read(s, d, "lineitem"), "l_shipdate",
        "l_extendedprice")
      val diverged = folded.withColumnRenamed("cnt", "cnt_f")
        .join(one.withColumnRenamed("cnt", "cnt_o"),
          Seq("day", "cents"), "full")
        .filter(!(col("cnt_f") <=> col("cnt_o"))).count()
      require(diverged == 0,
        s"fold-of-slices diverged from one-shot on $diverged lattice" +
          " cells")
    }

  /** q531's forensic arm (round-15, VERDICT r14 #3): the purgeWhere
    * lifecycle's exceptAll keep-side audits and the no-op re-purge are
    * invariants of the OPERATOR, not of the benchmarked plan — they
    * re-run the raw-fixture union and a second full purge per rep. A
    * fresh lake replays the exact q531 lifecycle here once per JVM:
    * every version subject-free AND keep-side bit-stable against the
    * raw batches, and a re-run purge finds nothing. */
  def purgeWhereForensics(s: SparkSession, d: String): Unit =
    once("purgeWhereForensics", d) {
      import graft.incremental.Snapshots
      val root = LakeFixtures.freshRoot("pwforensic") + "/lake"
      val fx = LakeFixtures.eventsDayBatches(s, d)
      LakeFixtures.copyInto(s, s"$fx/b1", root)
      Snapshots.commit(s, root) // v1
      LakeFixtures.copyInto(s, s"$fx/b2", root, append = true)
      Snapshots.commit(s, root) // v2
      LakeFixtures.copyInto(s, s"$fx/b3", root, append = true)
      Snapshots.commit(s, root) // v3
      val pred = col("user_id") % 97 === 0
      val rep = Snapshots.purgeWhere(s, root, pred).head()
      require(rep.getLong(0) == 3L, "3 versions must remap")
      (1L to 3L).foreach { v =>
        val got = Snapshots.readVersion(s, root, v)
        require(got.filter(pred).count() == 0L,
          s"v$v still holds purged rows")
        val keep = (1L to v).map(b => s.read.parquet(s"$fx/b$b"))
          .reduce(_ unionByName _).filter(!pred)
        require(got.exceptAll(keep).isEmpty
            && keep.exceptAll(got).isEmpty,
          s"v$v keep-side content changed across the purge")
      }
      val again = Snapshots.purgeWhere(s, root, pred).head()
      require(again.getLong(3) == 0L && again.getLong(1) == 0L,
        "a second purge must find nothing")
    }

  /** q535's forensic arm: after a dedup-loser purgeMatching, every
    * retained version must be loser-free AND keeper-complete. Same
    * fixture recipe as the query, fresh lake, once per JVM. */
  def dedupPurgeForensics(s: SparkSession, d: String): Unit =
    once("dedupPurgeForensics", d) {
      import graft.incremental.Snapshots
      import graft.llmdata.DedupOps
      val root = LakeFixtures.freshRoot("dpforensic") + "/lake"
      val docs = graft.sources.Tables.read(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      docs.filter(col("doc_id") < 250).coalesce(2).write.parquet(root)
      Snapshots.commit(s, root) // v1
      docs.filter(col("doc_id") >= 250).coalesce(2)
        .write.mode("append").parquet(root)
      Snapshots.commit(s, root) // v2
      val keepers = DedupOps.dedupCorpus(docs, "doc_id", "text",
          shingleSize = 3, bands = 4, rows = 4, jaccardThreshold = 0.4)
        .select(col("doc_id"))
      val losers = docs.select(col("doc_id"))
        .join(keepers, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      val nLosers = losers.count()
      require(nLosers > 0, "the corpus must contain near-dups")
      Snapshots.purgeMatching(s, root, losers, "doc_id")
      (1L to 2L).foreach { v =>
        val got = Snapshots.readVersion(s, root, v)
        require(got.join(losers, Seq("doc_id"), "left_semi")
            .count() == 0L, s"v$v still holds losers")
        require(got.join(losers, Seq("doc_id"), "left_anti").count()
            == got.count(), s"v$v lost keeper rows")
      }
    }

  /** q541's forensic arm: after a subject purge on the sequenced
    * merge-on-read lake, the subject is invisible at EVERY as-of op,
    * non-subject history is bit-stable, no tombstone file retains the
    * subject's key, and a purge re-run is a no-op. Same fixture
    * recipe as the query, fresh lake, once per JVM. */
  def morPurgeForensics(s: SparkSession, d: String): Unit =
    once("morPurgeForensics", d) {
      import graft.incremental.Deletes
      val root = LakeFixtures.freshRoot("mpforensic") + "/lake"
      val base = graft.sources.Tables.read(s, d, "orders")
        .filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      Deletes.initBase(s, root, base, 4)
      Deletes.upsert(s, root,
        base.filter(col("o_orderkey") % 20 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
        Seq("o_orderkey"))
      Deletes.upsert(s, root,
        base.filter(col("o_orderkey") % 20 === 0
            || col("o_orderkey") % 20 === 10)
          .withColumn("o_totalprice", col("o_totalprice") + lit(3000.0)),
        Seq("o_orderkey"))
      val subjects = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"))
      val preOther = Deletes.readMergedAsOf(s, root, 1L)
        .filter(col("o_orderkey") % 7 =!= 0).localCheckpoint(true)
      val rep = Deletes.purgeMatching(s, root, subjects,
        Seq("o_orderkey")).head()
      require(rep.getLong(2) > 0L, "subjects must have lived in adds")
      (0L to 2L).foreach { op =>
        require(Deletes.readMergedAsOf(s, root, op)
            .filter(col("o_orderkey") % 7 === 0).count() == 0L,
          s"subjects visible as of op $op")
      }
      val postOther = Deletes.readMergedAsOf(s, root, 1L)
      require(postOther.exceptAll(preOther).isEmpty
          && preOther.exceptAll(postOther).isEmpty,
        "non-subject history must stay bit-stable across the purge")
      Deletes.deleteKeys(s, root).foreach(k =>
        require(k.filter(col("o_orderkey") % 7 === 0).count() == 0L,
          "tombstone files must not retain the subject's key"))
      val rep2 = Deletes.purgeMatching(s, root, subjects,
        Seq("o_orderkey")).head()
      require(rep2.getLong(2) == 0L && rep2.getLong(3) == 0L,
        "a purge re-run must be a no-op")
    }

  /** The bench warm-up hook — run every cross-check untimed
    * ([[graft.Bench]] calls this beside LakeFixtures.warmAll). */
  def warmAll(s: SparkSession, d: String): Unit = {
    // NonFatal only (round-15 ADVICE): a fatal JVM error (OOM,
    // interrupt) during warm-up must propagate immediately — swallowed
    // here it would just resurface inside the timed rep and skew the
    // very measurement this hook protects. A NonFatal failure stays
    // quiet: the correctness gate re-runs the check and raises there.
    def quiet(b: => Unit): Unit =
      try b catch { case scala.util.control.NonFatal(_) => () }
    quiet(ivfPqAppendEqualsFlat(s, d))
    quiet(dtwBlockedEqualsAllPairs(s, d))
    quiet(aggMergeFoldEqualsOneShot(s, d))
    quiet(purgeWhereForensics(s, d))
    quiet(dedupPurgeForensics(s, d))
    quiet(morPurgeForensics(s, d))
  }
}
