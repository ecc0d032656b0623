package graft

import org.apache.spark.sql.functions._
import graft.llmdata.{Sampling, Similarity, TextAnalysis}
import graft.operators.ZOrder

/** Round-4 additions, second wave: KNN graph, LM familiarity scoring,
  * windowed co-occurrence, epoch replication, z-order layout. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // -- knnGraph -----------------------------------------------------------

  test("knnGraph finds the exact nearest neighbor within a probe collision") {
    // 16-dim so bits=8 hyperplanes (pairs 1..16) are all defined
    def v(seed: Int): Seq[Float] =
      (0 until 16).map(i => (((seed * 31 + i * 17) % 13) - 6).toFloat)
    val close = v(1).updated(0, v(1)(0) + 0.01f) // tiny perturbation of v(1)
    val emb = Seq((1L, v(1)), (2L, close), (3L, v(7)), (4L, v(11)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnGraph(emb, "vec_id", "embedding", k = 1, bits = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 and 2 share a bucket (identical signs) and are each other's top-1
    assert(out(1L) == 2L && out(2L) == 1L)
  }

  test("knnGraph emits each node at most k times and never a self-edge") {
    val emb = spark.read.parquet(sf("embeddings"))
    val out = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3, bits = 8)
      .cache()
    val perNode = out.groupBy($"node_id").count().agg(max($"count")).head.getLong(0)
    assert(perNode <= 3)
    assert(out.filter($"node_id" === $"neighbor_id").isEmpty)
    val ranks = out.filter($"node_id" === out.select(min($"node_id")).head.getLong(0))
      .orderBy($"rank").select($"rank").collect().map(_.getInt(0)).toSeq
    assert(ranks == (1 to ranks.length), "ranks are dense from 1")
    out.unpersist()
  }

  // -- lmFamiliarity ------------------------------------------------------

  test("lmFamiliarity scores known fraction and support ratio exactly") {
    val docs = Seq(
      (1L, "a b c"),  // bigrams: "a b", "b c"
      (2L, "a b d"),  // bigrams: "a b", "b d"
      (3L, "x")       // no bigrams
    ).toDF("doc_id", "text")
    // corpus counts: "a b"→2, "b c"→1, "b d"→1; heads: a→2, b→2
    val out = TextAnalysis.lmFamiliarity(docs, "doc_id", "text", minCount = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // doc1: n=2, known=1 ("a b"), support = (2+1)/(2+2) = 0.75
    assert(out(1L) == ((2L, 1L, 0.5, 0.75)))
    assert(out(2L) == ((2L, 1L, 0.5, 0.75)))
    assert(out(3L) == ((0L, 0L, 0.0, 0.0)), "bigram-free docs report zeros")
  }

  test("lmFamiliarity: a fully duplicated doc is fully known") {
    val docs = Seq((1L, "p q r"), (2L, "p q r"), (3L, "z z q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmFamiliarity(docs, "doc_id", "text")
      .filter($"doc_id" === 1).head
    assert(out.getDouble(3) == 1.0, "every bigram of a duplicated doc is known")
  }

  // -- cooccurrence -------------------------------------------------------

  test("cooccurrence counts ordered pairs within the window with exact lift") {
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrence(docs, "doc_id", "text",
        window = 2, minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // doc1 pairs (window 2): a→b, a→a, b→a, b→b, a→b; doc2: a→b
    // c(a)=3+1=4? doc1 has a,b,a,b → c(a)=2+1=3, c(b)=2+1=3; N=6
    assert(out(("a", "b")) == ((3L, 3L, 3L, 3L * 6.0 / 9.0)))
    assert(out(("a", "a")) == ((1L, 3L, 3L, 1L * 6.0 / 9.0)))
    assert(out(("b", "a")) == ((1L, 3L, 3L, 1L * 6.0 / 9.0)))
    assert(out(("b", "b")) == ((1L, 3L, 3L, 1L * 6.0 / 9.0)))
  }

  test("cooccurrence window never crosses document boundaries") {
    val docs = Seq((1L, "a x"), (2L, "y b")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrence(docs, "doc_id", "text",
      window = 3, minPairCount = 1)
    assert(out.filter($"a" === "x" && $"b" === "y").isEmpty,
      "x (end of doc 1) must not pair with y (start of doc 2)")
  }

  // -- replicateByEpochs --------------------------------------------------

  test("replicateByEpochs: integer epochs replicate exactly, zero drops") {
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "xx"))
      .toDF("doc_id", "lang")
    val out = Sampling.replicateByEpochs(docs, "doc_id", "lang",
        Map("en" -> 2.0), defaultEpochs = 0.0)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSet == Set((1L, 0), (1L, 1), (2L, 0), (2L, 1)))
  }

  test("replicateByEpochs: fractional epochs hit the expected count and are deterministic") {
    val docs = (1L to 1000L).map(i => (i, "en")).toDF("doc_id", "lang")
    val run = () => Sampling.replicateByEpochs(docs, "doc_id", "lang",
      Map("en" -> 1.5)).collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val a = run()
    assert(a == run(), "same inputs → same copies")
    // every doc at least once; ~50% twice (hash-fraction coin)
    assert(a.count(_._2 == 0) == 1000)
    val extra = a.count(_._2 == 1)
    assert(extra > 400 && extra < 600, s"~500 expected, got $extra")
  }

  test("replicateByEpochs epochs below 1 downsample") {
    val docs = (1L to 1000L).map(i => (i, "en")).toDF("doc_id", "lang")
    val n = Sampling.replicateByEpochs(docs, "doc_id", "lang",
      Map("en" -> 0.25)).count()
    assert(n > 150 && n < 350, s"~250 expected, got $n")
  }

  // -- bigramTopP ---------------------------------------------------------

  test("bigramTopP keeps the smallest prefix reaching p, crossing row included") {
    // head 'b' continuations: c×2, d×1, e×1 (n_head=4)
    val docs = Seq((1L, "b c b c b d b e")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramTopP(docs, "doc_id", "text",
        p = 0.75, minHeadCount = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getInt(6)))).toMap
    // cum_prev: c→0 < 3, d→2 < 3, e→3 not< 3 → c and d survive
    assert(out == Map(
      ("b", "c") -> ((2L, 4L, 0.5, 0.5, 1)),
      ("b", "d") -> ((1L, 4L, 0.25, 0.75, 2))))
  }

  test("bigramTopP at p=1 keeps every continuation") {
    val docs = Seq((1L, "b c b d")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramTopP(docs, "doc_id", "text",
      p = 1.0, minHeadCount = 2)
    assert(out.filter($"head" === "b").count() == 2)
  }

  // -- BPE train/encode ---------------------------------------------------

  test("bpeTrain learns merges by weighted pair frequency, greedy application") {
    // word counts: aaab×3, aab×2 → pair counts: (a,a)=3·2+2·1=8, (a,b)=5
    val docs = Seq((1L, "aaab aaab aab"), (2L, "aaab aab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "doc_id", "text", nMerges = 3)
    // round 2 tie (aa,a)=3 vs (a,b)=3 breaks to "a b" (string asc)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(2L) == Seq("aaab", "aa", "b"))
  }

  test("bpeTrain stops early when no pair repeats") {
    val docs = Seq((1L, "xy")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(docs, "doc_id", "text", nMerges = 5).isEmpty)
  }

  test("bpeEncode with no merges is character segmentation") {
    val docs = Seq((1L, "ab c")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", Nil).head
    assert(out.getSeq[String](1) == Seq("a", "b", "c"))
    assert(out.getLong(2) == 3L)
  }

  // -- hardNegatives ------------------------------------------------------

  test("hardNegatives excludes same-label candidates and ranks the rest") {
    def v(seed: Int): Seq[Float] =
      (0 until 16).map(i => (((seed * 31 + i * 17) % 13) - 6).toFloat)
    val close = v(1).updated(0, v(1)(0) + 0.01f)   // same signs as v(1)
    val close2 = v(1).updated(2, v(1)(2) + 0.01f)  // same signs as v(1)
    val emb = Seq((1L, v(1), 0), (2L, close, 0), (3L, close2, 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        k = 1, bits = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 3L, "the same-label near-dup (2) must not be a negative")
    assert(out(3L) != 3L && Set(1L, 2L).contains(out(3L)))
  }

  // -- corpusDiff ---------------------------------------------------------

  test("corpusDiff classifies added/removed/modified/unchanged by normalized content") {
    val oldSnap = Seq((1L, "Hello World"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "b!"), (3L, "c changed"), (4L, "d"))
      .toDF("doc_id", "text")
    val out = graft.llmdata.DedupOps.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "b!" normalizes to "b" — punctuation churn is NOT a modification
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "modified", 4L -> "added"))
  }

  // -- review-finding regressions -----------------------------------------

  test("corpusDiff: NULL text is presence, not absence") {
    val oldSnap = Seq((1L, null: String), (5L, null: String)).toDF("doc_id", "text")
    val newSnap = Seq((1L, "hello")).toDF("doc_id", "text")
    val out = graft.llmdata.DedupOps.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "modified", "null→text on a both-sides id is a modification")
    assert(out(5L) == "removed", "a null-text doc only in the old snapshot was removed")
  }

  test("knnGraph: a zero vector never displaces real neighbors (NaN guard)") {
    def v(seed: Int): Seq[Float] =
      (0 until 16).map(i => (((seed * 31 + i * 17) % 13) - 6).toFloat)
    val close = v(1).updated(0, v(1)(0) + 0.01f)
    val zero = Seq.fill(16)(0.0f)  // lands in some bucket; cosine = NaN
    val emb = Seq((1L, v(1)), (2L, close), (9L, zero))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnGraph(emb, "vec_id", "embedding", k = 1, bits = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L && out(2L) == 1L,
      "the NaN-scored zero vector must not be anyone's rank-1 neighbor")
    assert(!out.contains(9L), "the zero vector itself has no non-NaN candidates")
  }

  test("imageAHash: flat images carry no perceptual signal and never pair") {
    val black = pngBytes(16, 16)((_, _) => 0x000000)
    val white = pngBytes(16, 16)((_, _) => 0xffffff)
    val media = Seq((1L, black), (2L, white)).toDF("asset_id", "payload")
    val hashes = graft.llmdata.Multimodal.imageAHash(media)
    assert(hashes.collect().forall(!_.decoded),
      "flat images are excluded like undecodable payloads")
    assert(graft.llmdata.Multimodal.imageNearDupPairs(hashes, 2).isEmpty,
      "black and white must not false-pair at hash 0")
  }

  test("bpeEncode plans and runs with a vocabulary-scale merge list") {
    val docs = Seq((1L, "aaab aab")).toDF("doc_id", "text")
    // 2k merges (mostly no-ops) — the expression-tree form died here
    val merges = Seq(("a", "a"), ("a", "b")) ++
      (0 until 2000).map(i => (s"x$i", s"y$i"))
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges).head
    assert(out.getSeq[String](1) == Seq("aa", "ab", "aa", "b"))
  }

  // -- centroidOutliers ---------------------------------------------------

  test("centroidOutliers ranks by exact distance to the decimal-exact centroid") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(9.0f, 8.0f))
    ).toDF("vec_id", "embedding")
    // centroid = (3, 2); dist2: vec 4 → 36+36=72, vecs 1-3 → 4+4=8
    val out = Similarity.centroidOutliers(emb, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((4L, 72.0), (1L, 8.0)),
      "farthest first, ties broken by lowest id")
  }

  // -- materializePacked --------------------------------------------------

  test("materializePacked concatenates each bin's docs in id order") {
    val docs = Seq((0L, "a b"), (1L, "x"), (2L, "c"), (3L, "y z"), (4L, "d e f"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.materializePacked(docs, "doc_id", "text",
        budgetTokens = 3, nShards = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // shard 0: docs 0 (2 tok, cum 2), 2 (1 tok, cum 3) → bin 0; 4 (3 tok) → bin 1
    // shard 1: docs 1 (1 tok), 3 (2 tok) → bin 0
    assert(out == Map(
      (0, 0L) -> ((2L, 3L, "a b c")),
      (0, 1L) -> ((1L, 3L, "d e f")),
      (1, 0L) -> ((2L, 3L, "x y z"))))
  }

  // -- exactDedupStream ---------------------------------------------------

  test("exactDedupStream drops normalized-fingerprint duplicates across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-xdedup").toString
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.Streaming.exactDedupStream(
        in.toDF().toDF("id", "ts", "text"), "ts", "text", lateness = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("xdedup")
      .option("checkpointLocation", dir + "/ckpt").start()
    try {
      in.addData((1L, ts(1), "Hello,  World!"))
      q.processAllAvailable()
      // same normalized fingerprint ("hello world") in a LATER batch +
      // a genuinely novel doc
      in.addData((2L, ts(2), "hello world"), (3L, ts(2), "something else"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("xdedup").select($"id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L), "the cross-batch duplicate must be dropped")
  }

  // -- image perceptual hash ----------------------------------------------

  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("imageAHash is stable under a tiny pixel change, far for the inverse") {
    val a = pngBytes(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    val b = pngBytes(16, 16)((x, y) =>
      if (x == 0 && y == 0) 0x0a0a0a else if (x < 8) 0x000000 else 0xffffff)
    val c = pngBytes(16, 16)((x, _) => if (x < 8) 0xffffff else 0x000000)
    val media = Seq((1L, a), (2L, b), (3L, c),
      (4L, "not an image".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val hashes = graft.llmdata.Multimodal.imageAHash(media)
    val byId = hashes.collect().map(x => x.asset_id -> x).toMap
    assert(byId(1L).decoded && byId(2L).decoded && byId(3L).decoded)
    assert(!byId(4L).decoded, "text payloads must flag undecoded")
    assert(byId(1L).ahash == byId(2L).ahash,
      "one perturbed pixel must not move the aHash")
    assert(java.lang.Long.bitCount(byId(1L).ahash ^ byId(3L).ahash) == 64,
      "the inverted image is the complement hash")
    val pairs = graft.llmdata.Multimodal.imageNearDupPairs(hashes, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), "only the near-identical pair survives")
  }

  test("imageDHash: invariant to a global brightness shift where aHash is not guaranteed") {
    // horizontal gradient image and a +60-brightness clone: every local
    // left-right ordering is preserved -> identical dHash
    def clamp(v: Int) = math.min(255, math.max(0, v))
    def grey(v: Int) = { val c = clamp(v); (c << 16) | (c << 8) | c }
    val a = pngBytes(18, 16)((x, _) => grey(x * 10))
    val bright = pngBytes(18, 16)((x, _) => grey(x * 10 + 60))
    val reversed = pngBytes(18, 16)((x, _) => grey((17 - x) * 10))
    val media = Seq((1L, a), (2L, bright), (3L, reversed),
      (4L, pngBytes(16, 16)((_, _) => 0x808080)), // flat
      (5L, "junk".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val hashes = graft.llmdata.Multimodal.imageDHash(media)
      .collect().map(x => x.asset_id -> x).toMap
    assert(hashes(1L).decoded && hashes(2L).decoded && hashes(3L).decoded)
    assert(hashes(1L).dhash == hashes(2L).dhash,
      "a monotone tone shift must not move the dHash")
    assert(hashes(1L).dhash == -1L,
      "a strictly increasing gradient sets every comparison bit")
    assert(java.lang.Long.bitCount(hashes(1L).dhash ^ hashes(3L).dhash) == 64,
      "the mirrored gradient flips every comparison")
    assert(!hashes(4L).decoded, "flat images carry no gradient signal")
    assert(!hashes(5L).decoded)
  }

  test("imageNearDupPairs pigeonhole recall: hamming <= budget pairs are always found") {
    import graft.llmdata.Multimodal.ImageHash
    // synthetic hashes: base, base with 2 flipped bits (in DIFFERENT
    // 21/22-bit blocks — the adversarial case for block agreement), and
    // a 3-bit flip that must be excluded
    val base = 0x0123456789abcdefL
    val two = base ^ (1L << 3) ^ (1L << 40)
    val three = base ^ (1L << 3) ^ (1L << 30) ^ (1L << 60)
    val hs = Seq(ImageHash(1L, base, decoded = true),
      ImageHash(2L, two, decoded = true),
      ImageHash(3L, three, decoded = true)).toDS()
    val pairs = graft.llmdata.Multimodal.imageNearDupPairs(hs, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 2)))
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L),
      "3 flips exceed the budget")
  }

  // -- ZOrder -------------------------------------------------------------

  test("zValue interleaves bits (worked examples)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("a", "b")
    val out = df.select(ZOrder.zValue($"a", $"b", 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(3,5) = a bits {0,1} at even, b bits {0,2} at odd:
    // 1 + 4 + 2 + 32 = 39
    assert(out == Seq(0L, 1L, 2L, 3L, 39L, (1L << 20) - 1))
  }

  test("zValue masks inputs above bitsPer bits") {
    val out = Seq((1024L + 3L, 0L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 10)).head.getLong(0)
    assert(out == 5L, "bit 10 of a is out of range and ignored")
  }

  test("z-order layout written to parquet yields file stats bounded on both dims") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zfiles").toString
    val df = (for { a <- 0 until 64; b <- 0 until 64 } yield (a, b)).toDF("a", "b")
    graft.operators.ZOrder.layout(df, "a", "b", bitsPer = 6, nFiles = 16)
      .write.parquet(dir + "/z")
    val stats = graft.sources.Tables.fileStats(spark, dir + "/z", Seq("a", "b"))
      .collect()
    assert(stats.length >= 8, "the range partitioning must spread files")
    val spans = stats.map(r => (r.getAs[Int]("max_a") - r.getAs[Int]("min_a"),
      r.getAs[Int]("max_b") - r.getAs[Int]("min_b")))
    val (avgA, avgB) = (spans.map(_._1).sum.toDouble / spans.length,
      spans.map(_._2).sum.toDouble / spans.length)
    assert(avgA < 40 && avgB < 40,
      s"per-FILE min/max must bound both dims (a-span $avgA, b-span $avgB) — " +
        "this is what lets a reader skip files on either predicate")
  }

  test("z-order layout bounds BOTH dimensions per partition; single-column sort does not") {
    val df = (for { a <- 0 until 64; b <- 0 until 64 } yield (a, b)).toDF("a", "b")
    def spans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val parts = laid
        .withColumn("pid", spark_partition_id())
        .groupBy($"pid")
        .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
        .agg(avg($"sa"), avg($"sb")).head
      (parts.getDouble(0), parts.getDouble(1))
    }
    val (za, zb) = spans(ZOrder.layout(df, "a", "b", bitsPer = 6, nFiles = 16))
    val (la, lb) = spans(df.repartitionByRange(16, $"a").sortWithinPartitions($"a"))
    assert(za < 40 && zb < 40,
      s"z-order must bound both dims (got a-span $za, b-span $zb)")
    assert(lb > 55, s"a-only sort leaves b unbounded (got $lb)")
    assert(za < lb, "z-order strictly beats single-column sort on the second dim")
  }

  test("resizeImages really rescales decodable payloads, passes others through") {
    // 16x12 left-black right-white split
    val src = pngBytes(16, 12)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    val junk = "definitely not an image".getBytes("UTF-8")
    val media = Seq((1L, src), (2L, junk)).toDF("asset_id", "payload")
    val out = graft.llmdata.Multimodal.resizeImages(media, targetW = 8, targetH = 6)
      .collect().map(r => r.asset_id -> r).toMap
    assert(out(1L).decoded && out(1L).width == 8 && out(1L).height == 6)
    // the emitted payload is a REAL PNG of the claimed size with the
    // source's structure preserved (left half dark, right half bright)
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).payload))
    assert(round.getWidth == 8 && round.getHeight == 6)
    assert((round.getRGB(1, 3) & 0xffffff) == 0x000000
      && (round.getRGB(6, 3) & 0xffffff) == 0xffffff,
      "nearest-neighbor scaling preserves the halves")
    assert(!out(2L).decoded && out(2L).payload.sameElements(junk),
      "undecodable payloads pass through byte-unchanged")
  }

  // -- collocations -------------------------------------------------------

  test("collocations computes exact lift and dense rank on a hand fixture") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b),(b,c) → (a,b) count 3
    // unigrams: a=3, b=3, c=1; N=7 → lift(a,b) = 7·3 / (3·3)
    val out = TextAnalysis.collocations(docs, "doc_id", "text", minPairCount = 2)
      .collect()
    assert(out.length == 1, "minPairCount=2 keeps only (a,b)")
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(r.getDouble(5) == 7.0 * 3.0 / (3.0 * 3.0), "lift is IEEE-exact")
    assert(r.getInt(6) == 1)
  }

  test("collocations never pairs tokens across document boundaries") {
    val docs = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val pairs = TextAnalysis.collocations(docs, "doc_id", "text", minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a doc1-tail→doc2-head leak would fabricate (y, y)
    assert(pairs == Set(("x", "y"), ("y", "x")))
  }

  test("collocations ranks are dense from 1 in lift-descending order") {
    val docs = Seq((1L, "p q p q r s r s p q")).toDF("doc_id", "text")
    val rows = TextAnalysis.collocations(docs, "doc_id", "text", minPairCount = 1)
      .orderBy($"rank").collect()
    assert(rows.map(_.getInt(6)).toSeq == (1 to rows.length))
    val lifts = rows.map(_.getDouble(5)).toSeq
    assert(lifts == lifts.sorted.reverse, "rank follows lift desc")
  }
}
