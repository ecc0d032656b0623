package graft

import org.apache.spark.sql.functions._
import graft.llmdata.{Sampling, TextAnalysis}

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("capPerStratum keeps the top-cap rows per stratum in order") {
    val docs = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.8), ("a", 4L, 0.6),
      ("b", 5L, 0.5)
    ).toDF("source", "doc_id", "quality")
    val out = Sampling.capPerStratum(docs, "source",
        Seq(col("quality").desc, col("doc_id").asc), cap = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(out == Set((1L, 1), (3L, 2), (5L, 1)),
      "a keeps its two best (0.9, 0.8); b keeps its only row")
  }

  test("capPerStratum breaks quality ties by id deterministically") {
    val docs = Seq(("a", 10L, 0.5), ("a", 11L, 0.5), ("a", 12L, 0.5))
      .toDF("source", "doc_id", "quality")
    val out = Sampling.capPerStratum(docs, "source",
        Seq(col("quality").desc, col("doc_id").asc), cap = 2)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(10L, 11L), "lowest ids win equal quality")
  }

  test("temperatureMix flattens shares to n^0.5 with integer-exact quotas") {
    // big: n=100 → w=10; small: n=4 → w=2; W=12; budget=24
    // quotas: 24·10 div 12 = 20, 24·2 div 12 = 4 (proportional would be ~23/1)
    val docs = ((1L to 100L).map(("big", _)) ++ (101L to 104L).map(("small", _)))
      .toDF("lang", "doc_id")
    val kept = Sampling.temperatureMix(docs, "doc_id", "lang", budget = 24L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("big" -> 20L, "small" -> 4L))
  }

  test("temperatureMix never upsamples: quota caps at the stratum size") {
    val docs = ((1L to 9L).map(("a", _)) ++ Seq(("b", 10L))).toDF("lang", "doc_id")
    val kept = Sampling.temperatureMix(docs, "doc_id", "lang", budget = 1000L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("a" -> 9L, "b" -> 1L), "budget beyond corpus keeps all")
  }

  test("temperatureMix grows monotonically with budget") {
    val docs = ((1L to 50L).map(("a", _)) ++ (51L to 70L).map(("b", _)))
      .toDF("lang", "doc_id")
    def ids(b: Long) = Sampling.temperatureMix(docs, "doc_id", "lang", b)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = ids(10L); val large = ids(30L)
    assert(small.subsetOf(large), "a bigger budget only ADDS rows")
  }

  test("temperatureMix at alpha=1 is proportional allocation") {
    // n=30/10, w=30e6/10e6, budget=20 → quotas 15/5
    val docs = ((1L to 30L).map(("x", _)) ++ (31L to 40L).map(("y", _)))
      .toDF("lang", "doc_id")
    val kept = Sampling.temperatureMix(docs, "doc_id", "lang",
        budget = 20L, alpha = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("x" -> 15L, "y" -> 5L))
  }

  test("oovRate counts tokens missing from the vocabulary") {
    val docs = Seq(
      (1L, "the cat sat"),          // 'sat' OOV → 1/3
      (2L, "the the dog"),          // all in vocab → 0/3
      (3L, "zz yy"),                // all OOV → 2/2
      (4L, "   ")                   // token-less → 0/0 → 0.0
    ).toDF("doc_id", "text")
    val vocab = Seq("the", "cat", "dog").toDF("term")
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 1L, 1.0 / 3)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((2L, 2L, 1.0)))
    assert(out(4L) == ((0L, 0L, 0.0)), "empty doc still reported, rate 0")
  }

  test("oovRate against vocabTopK covers the whole corpus at full k") {
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabTopK(docs, "doc_id", "text", k = 10)
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
      .agg(sum(col("n_oov"))).head.getLong(0)
    assert(out == 0L, "vocab covering every term → zero OOV anywhere")
  }

  test("paddingWaste: length-sorted batches, exact waste, short tail batch") {
    // 5 docs, batch of 2: sorted token counts (1,2,3,5,9) →
    // batches [1,2] [3,5] [9]; waste = 1, 2, 0
    val docs = Seq((10L, 9L), (11L, 1L), (12L, 5L), (13L, 2L), (14L, 3L))
      .toDF("doc_id", "n_tokens")
    val out = graft.llmdata.Sampling.paddingWaste(docs, "doc_id", "n_tokens", 2)
      .collect().map(r => r.getAs[Long]("batch_id") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).getAs[Long]("max_tokens") == 2L)
    assert(out(0L).getAs[Long]("waste_tokens") == 1L)   // 2*2 - 3
    assert(out(1L).getAs[Long]("waste_tokens") == 2L)   // 2*5 - 8
    assert(out(1L).getAs[Double]("waste_frac") == 2.0 / 10.0)
    // tail batch has one doc: padded == sum, zero waste
    assert(out(2L).getAs[Long]("n_docs") == 1L)
    assert(out(2L).getAs[Long]("waste_tokens") == 0L)
  }

  test("paddingWaste ties broken by id: equal lengths split deterministically") {
    // four docs all length 4, batch of 3 → batch 0 = ids (1,2,3), batch 1 = (4)
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L))
      .toDF("doc_id", "n_tokens")
    val out = graft.llmdata.Sampling.paddingWaste(docs, "doc_id", "n_tokens", 3)
      .collect().map(r => r.getAs[Long]("batch_id") -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map(0L -> 3L, 1L -> 1L))
  }

  test("sourceCurationReport charges cross-source dups and decides per thresholds") {
    val docs = Seq(
      (1L, "src_a", "the cat sat on the mat, happily resting today."),
      (2L, "src_a", "a dog ran over the hill today, quickly indeed."),
      // src_b: two of three docs copy src_a content → dup_frac 2/3 → drop
      (10L, "src_b", "the cat sat on the mat, happily resting today."),
      (11L, "src_b", "a dog ran over the hill today, quickly indeed."),
      (12L, "src_b", "completely novel words appear in this line, yes."),
      // src_c: one of four dup → 0.25 ∈ (0.2, 0.5] → review
      (20L, "src_c", "the cat sat on the mat, happily resting today."),
      (21L, "src_c", "fresh unique sentence number one for the corpus, ok."),
      (22L, "src_c", "fresh unique sentence number two for the corpus, ok."),
      (23L, "src_c", "fresh unique sentence number three for the corpus, ok."),
      // src_d: sub-5-token docs score 0 → avg < 0.3 → drop
      (30L, "src_d", "short text"), (31L, "src_d", "tiny doc")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceCurationReport(docs, "doc_id", "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_redundant"),
          r.getAs[String]("decision")))).toMap
    assert(out("src_a") == ((2L, 0L, "keep")))
    assert(out("src_b") == ((3L, 2L, "drop")), "cross-source copies counted")
    assert(out("src_c") == ((4L, 1L, "review")))
    assert(out("src_d") == ((2L, 0L, "drop")), "low quality alone drops")
  }

  test("kwicSnippets clips the window at document edges, first hit wins") {
    val docs = Seq(
      (1L, "alpha beta target gamma delta epsilon"),
      (2L, "target at the very start here"),
      (3L, "no match in this one"),
      (4L, "twice target then target again")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.kwicSnippets(docs, "doc_id", "text",
        Seq("target"), window = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("position"), r.getAs[String]("snippet")))).toMap
    assert(out(1L) == ((3L, "alpha beta target gamma delta")))
    assert(out(2L) == ((1L, "target at the")), "left edge clips")
    assert(!out.contains(3L))
    assert(out(4L) == ((2L, "twice target then target")), "first occurrence")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("systematicWeighted lands exactly k grid hits, matching the hash-order truth") {
    val items = Seq((1L, 5L), (2L, 1L), (3L, 40L), (4L, 2L), (5L, 12L))
    val df = items.toDF("doc_id", "w")
    val k = 7L
    val out = Sampling.systematicWeighted(df, "doc_id", "w", k, salt = "s")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(out.values.sum == k, s"grid hits must total k: $out")
    // replicate the operator's order and grid in plain Scala
    val ordered = items.sortBy { case (id, _) => (md5hex(s"$id" + "s"), id) }
    val bigW = items.map(_._2).sum
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    var cw = 0L
    val truth = ordered.flatMap { case (id, w) =>
      cw += w
      val hits = ceilDiv(cw * k, bigW) - ceilDiv((cw - w) * k, bigW)
      if (hits >= 1) Some(id -> hits) else None
    }.toMap
    assert(out == truth, s"operator $out vs scala truth $truth")
    // the heavy item (w=40 > W/k ≈ 8.6) is always selected
    assert(out.contains(3L) && out(3L) >= 4L)
  }

  test("tokenBudgetSubset is the exact hash-order prefix, and budgets nest") {
    val items = (1L to 30L).map(i => (i, 3L + i % 5))
    val df = items.toDF("doc_id", "w")
    def subset(b: Long) =
      Sampling.tokenBudgetSubset(df, "doc_id", "w", b, salt = "t")
        .collect().map(_.getAs[Long]("doc_id")).toSet
    val (small, large) = (subset(30L), subset(60L))
    assert(small.subsetOf(large), "a smaller budget must be a prefix")
    // exact prefix truth in plain Scala
    val ordered = items.sortBy { case (id, _) => (md5hex(s"$id" + "t"), id) }
    var cw = 0L
    val truth = ordered.takeWhile { case (_, w) => cw += w; cw <= 30L }
      .map(_._1).toSet
    assert(small == truth, s"$small vs $truth")
    val sumW = items.filter(t => small(t._1)).map(_._2).sum
    assert(sumW <= 30L)
  }

  test("exactStratifiedSplit hits floor-exact per-stratum counts") {
    val df = ((1 to 10).map(i => (i.toLong, "big")) ++
      (11 to 13).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val out = Sampling.exactStratifiedSplit(df, "doc_id", "source",
        Seq("train" -> 800L, "val" -> 100L, "test" -> 100L))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("split")))
      .groupBy(identity).view.mapValues(_.length).toMap
    // big (n=10): 8 / 1 / 1 exactly
    assert(out(("big", "train")) == 8 && out(("big", "val")) == 1
      && out(("big", "test")) == 1)
    // small (n=3): floor thresholds → 2 train, 0 val, 1 test remainder
    assert(out(("small", "train")) == 2 && out(("small", "test")) == 1
      && !out.contains(("small", "val")))
  }

  test("exactStratifiedSplit is deterministic and salt-sensitive") {
    val df = (1 to 20).map(i => (i.toLong, "s")).toDF("doc_id", "source")
    val splits = Seq("train" -> 1L, "test" -> 1L)
    def assign(salt: String) =
      Sampling.exactStratifiedSplit(df, "doc_id", "source", splits, salt)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val a = assign("x")
    assert(assign("x") == a, "same salt, same assignment")
    assert(a.values.count(_ == "train") == 10 && a.values.count(_ == "test") == 10)
    assert(assign("y") != a, "salt reshuffles the ranking")
  }
}
