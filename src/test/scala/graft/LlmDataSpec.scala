package graft

import org.apache.spark.sql.functions._
import graft.llmdata.{DedupOps, Multimodal, Similarity, TextAnalysis}

class LlmDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),      // near dup of 1
    (4L, "completely different words entirely here unrelated content")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical fingerprints, keeper = min id") {
    val out = DedupOps.exact(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("dup_count") == 2).get
    assert(dup.getAs[Long]("keeper_id") == 1L)
  }

  test("fingerprint normalizes case/punctuation/whitespace") {
    val pairs = Seq(("The  quick,   FOX!", "the quick fox")).toDF("a", "b")
      .select(TextAnalysis.fingerprint($"a").as("fa"), TextAnalysis.fingerprint($"b").as("fb"))
      .first()
    assert(pairs.getString(0) == pairs.getString(1))
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = DedupOps.minhashLsh(docs, "doc_id", "text", jaccardThreshold = 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup must collide in every band")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not pair")
    val exact = DedupOps.minhashLsh(docs, "doc_id", "text", jaccardThreshold = 0.999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(exact == Set((1L, 2L)))
  }

  test("near-dup clustering assigns transitive components the min-id label") {
    // chain: 1-2, 2-3 (transitive), separate pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val clusters = DedupOps.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("simhash: identical docs get identical fingerprints; near dups are close") {
    val fps = DedupOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fps(1L) == fps(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(1L), fps(3L)) < hamming(fps(1L), fps(4L)))
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("language markers score and langid is deterministic") {
    val out = Seq((1L, "the cat and the dog of the house"),
                  (2L, "der Hund und die Katze und der Vogel"),
                  (3L, "xyzzy plugh"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.languageId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("int8 quantization bounds reconstruction error by scale/2") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val joined = emb.join(q, "vec_id")
      .select($"vec_id", $"scale",
        Similarity.dequantize($"qvec", $"scale").as("deq"),
        transform($"embedding", x => x.cast("double")).as("orig"))
      .withColumn("max_err", array_max(zip_with($"deq", $"orig", (d, o) => abs(d - o))))
    val bad = joined.filter($"max_err" > $"scale" / 2 + 1e-12).count()
    assert(bad == 0, "every element must reconstruct within scale/2")
    // quantized values fit int8
    val range = q.select(array_max($"qvec").as("mx"), array_min($"qvec").as("mn"))
      .agg(max($"mx"), min($"mn")).first()
    assert(range.getInt(0) <= 127 && range.getInt(1) >= -127)
    // zero vector → scale 0, all-zero qvec
    val z = Similarity.quantizeInt8(
      Seq((1L, Array.fill(4)(0f))).toDF("vec_id", "embedding"), "vec_id", "embedding").first()
    assert(z.getDouble(1) == 0.0 && z.getSeq[Int](2).forall(_ == 0))
  }

  test("quantized IVF index returns exactly the direct dequantized-corpus results") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter($"vec_id" < 8)
    val path = java.nio.file.Files.createTempDirectory("graft-qivf").toString + "/idx"
    Similarity.ivfIndexWriteQuantized(emb, "vec_id", "embedding", path,
      nCells = 8, lloydIters = 2)
    // direct reference: same dequantized corpus, same deterministic fit
    val deq = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .withColumn("embedding", Similarity.dequantize($"qvec", $"scale"))
      .select("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val direct = rows(Similarity.ivfTopK(deq, qs, "vec_id", "embedding",
      k = 3, nCells = 8, lloydIters = 2))
    val indexed = rows(Similarity.ivfTopKIndexedQuantized(spark, path, qs,
      "vec_id", "embedding", k = 3))
    assert(indexed == direct)
    // and the stored assignment is actually int8-quantized
    val stored = spark.read.parquet(s"$path/assigned")
    assert(stored.schema("qvec").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))
  }

  test("quantized search recalls full-precision neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter($"vec_id" < 16)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val full = topSets(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 3))
    val deq = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select($"vec_id", Similarity.dequantize($"qvec", $"scale").as("embedding"))
    val quant = topSets(Similarity.bruteForceTopK(deq, deq.filter($"vec_id" < 16),
      "vec_id", "embedding", k = 3))
    val recall = full.keys.toSeq.map { q =>
      full(q).intersect(quant.getOrElse(q, Set.empty)).size.toDouble / full(q).size
    }.sum / full.size
    assert(recall >= 0.8, s"int8 top-3 recall vs full precision was $recall")
  }

  test("containment flags doc-in-doc pairs that jaccard understates") {
    val sub = "alpha beta gamma delta epsilon zeta"  // 4 trigrams, all in sup
    val sup = sub + " eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    val fixtures = Seq((1L, sub), (2L, sup), (3L, "totally unrelated words here now then"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.containmentPairs(fixtures, "doc_id", "text",
      containmentThreshold = 0.9).collect()
    val p = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p.isDefined, "the contained doc must pair with its superset")
    assert(p.get.getAs[Double]("containment_a") == 1.0)
    assert(p.get.getAs[Double]("jaccard") < 0.5, "jaccard understates the relation")
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("containmentSearch finds corpus docs containing a query's shingles") {
    // query 1 has shingle set {aaa bbb ccc, bbb ccc ddd} (|Q| = 2)
    val queries = Seq((1L, "aaa bbb ccc ddd")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro words aaa bbb ccc ddd trailing content here"), // full containment
      (11L, "aaa bbb ccc elsewhere entirely other stuff"),        // half
      (12L, "unrelated corpus document nothing shared")
    ).toDF("doc_id", "text")
    val out = DedupOps.containmentSearch(corpus, queries, "doc_id", "text",
      shingleSize = 3, containmentThreshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("containment")).toMap
    assert(out == Map(10L -> 1.0, 11L -> 0.5))
    val strict = DedupOps.containmentSearch(corpus, queries, "doc_id", "text",
      shingleSize = 3, containmentThreshold = 0.6)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(strict == Set(10L), "threshold prunes the partial match")
  }

  test("repetition features and filter flag degenerate docs, pass diverse ones") {
    val fixtures = Seq(
      (1L, "spam spam spam spam"),                         // dup 3/4, top bigram 3/3
      (2L, "one two three four five six seven eight"),     // dup 0, top 1/7
      (3L, ""),                                            // empty → zeros
      (4L, "alpha")).toDF("doc_id", "text")                // 1 token, no bigrams
    val f = TextAnalysis.repetitionFeatures(fixtures, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(f(1L) == ((4L, 0.75, 1.0)))
    assert(f(2L)._2 == 0.0 && f(2L)._3 == 1.0 / 7)
    assert(f(3L) == ((0L, 0.0, 0.0)))
    assert(f(4L) == ((1L, 0.0, 0.0)))
    val kept = TextAnalysis.repetitionFilter(fixtures, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L), "only the spam doc is dropped")
  }

  test("profile-frame language ID classifies multi-language fixtures") {
    val fixtures = Seq(
      (1L, "the cat and the dog of the house is here"),
      (2L, "der Hund und die Katze ist nicht mit den"),
      (3L, "el que de la los en un por"),
      (4L, "le les des est une dans pour"),
      (5L, "wo shi ni de ta men zai"),
      (6L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.languageIdByProfile(fixtures, "doc_id", "text",
      TextAnalysis.profileFrame(spark)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr",
      5L -> "zh", 6L -> "und"))
  }

  test("language ID held-out sentences: natural text, all 8 languages") {
    // HELD OUT: none of these sentences was consulted when ranking the
    // profiles; each mixes function words with content words the
    // profiles have never seen, and the Romance/Germanic cross-language
    // collisions ('de', 'la', 'le', 'en', 'is') are all present — the
    // Zipf weighting has to resolve them, not term overlap alone
    val fixtures = Seq(
      (1L, "the children were playing in the garden and it was warm"),
      (2L, "der alte Mann ist mit dem Fahrrad zu der Schule gefahren"),
      (3L, "la casa de mi madre es muy grande y los niños juegan en el patio"),
      (4L, "le chien est dans le jardin et les enfants jouent pas loin du pont"),
      (5L, "il gatto dorme sulla sedia e non sono sicuro che la cosa sia vera"),
      (6L, "o menino não está em casa mas a menina foi para o mercado com ele"),
      (7L, "de hond is niet in het huis en de kat zit op de tafel met een bal"),
      (8L, "wo men zai zhe li ni shi bu shi hen hao")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languageIdByProfile(fixtures, "doc_id", "text",
      TextAnalysis.profileFrame(spark)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr",
      5L -> "it", 6L -> "pt", 7L -> "nl", 8L -> "zh"), s"got $out")
  }

  test("chunkByTokens rejects gap strides (phantom-chunk guard)") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(df, "doc_id", "text", chunkTokens = 5, stride = 10)
    }
  }

  test("token counting and quality features") {
    val f = TextAnalysis.qualityFeatures(Seq((1L, "one two  three")).toDF("id", "text"), "text")
      .select("n_tokens", "mean_word_len").first()
    assert(f.getLong(0) == 3L)
    val q = TextAnalysis.qualityScore(Seq((1L, "too short")).toDF("id", "text"), "text")
      .select("quality_score").first().getDouble(0)
    assert(q == 0.0) // < 5 tokens floor
  }

  test("brute-force cosine top-k: nearest vector wins, self excluded") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // closest to 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") == 2L)
    assert(top.forall(_.getAs[Long]("neighbor_id") != 1L))
  }

  test("LSH top-k returns a subset of brute-force candidates with matching scores") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 4)
    val bf = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 50)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb, qs, "vec_id", "embedding", k = 3, bits = 4).collect()
    assert(lsh.nonEmpty)
    // every LSH result's cosine must equal the brute-force cosine for that pair
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bf.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12))
    }
  }

  test("multi-probe sign-LSH recovers a neighbor across one flipped hyperplane") {
    // cluster A: pairs (1,-1) → all 8 bucket bits set; member 4 sits just
    // on the OTHER side of hyperplane 0, so exact-bucket LSH misses it and
    // only the Hamming-1 probe finds it
    val a = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def perturbed(idx: Int) = { val v = a.clone(); v(idx) = v(idx) + 0.1f; v }
    val m4 = a.clone(); m4(0) = 0.95f; m4(1) = 1.0f
    val b = a.map(x => -x)
    val vecs = Seq(
      1L -> a, 2L -> perturbed(2), 3L -> perturbed(4), 4L -> m4,
      10L -> b, 11L -> b.map(_ * 1.1f), 12L -> perturbed(6).map(x => -x)
    ).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" === 1)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Long]("neighbor_id")).toSet
    val bf = ids(Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", k = 3))
    val lsh = ids(Similarity.lshTopK(vecs, qs, "vec_id", "embedding", k = 3, bits = 8))
    assert(bf.contains(4L), "the flipped vector is a true top-3 neighbor")
    assert(lsh == bf, "multi-probe recall must be 1.0 on this construction")
  }

  test("IVF nprobe=2 recall dominates nprobe=1 against brute-force truth") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 4)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val bf = topSets(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 3))
    def recall(ivf: Map[Long, Set[Long]]): Double =
      bf.map { case (q, truth) =>
        ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / bf.size
    val r1 = recall(topSets(Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
      k = 3, nCells = 8, lloydIters = 2, nprobe = 1)))
    val r2 = recall(topSets(Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
      k = 3, nCells = 8, lloydIters = 2, nprobe = 2)))
    assert(r2 >= r1, s"nprobe=2 recall $r2 must not trail nprobe=1 recall $r1")
    assert(r2 > 0.3, s"nprobe=2 recall $r2 unexpectedly low")
  }

  test("materialized IVF index returns exactly the per-query ivfTopK results") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 4)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", path, nCells = 8, lloydIters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val direct = rows(Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
      k = 3, nCells = 8, lloydIters = 2, nprobe = 2))
    val indexed = rows(Similarity.ivfTopKIndexed(spark, path, qs, "vec_id", "embedding",
      k = 3, nprobe = 2))
    assert(indexed == direct)
    // the assignment table is physically partitioned by cell (the probe
    // side prunes unprobed cells' files)
    val dirs = new java.io.File(s"$path/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell=")))
  }

  test("ivfIndexAppend: indexed-after-append ≡ direct index on the union") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val fitted = emb.filter($"vec_id" % 4 =!= 0) // initial corpus
    val batch = emb.filter($"vec_id" % 4 === 0)  // appended later
    val qs = emb.filter($"vec_id" < 4)
    val base = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString
    val grown = s"$base/grown"; val oneshot = s"$base/oneshot"
    // index A: fit on the initial corpus, append the batch
    Similarity.ivfIndexWrite(fitted, "vec_id", "embedding", grown,
      nCells = 8, lloydIters = 2)
    Similarity.ivfIndexAppend(spark, grown, batch, "vec_id", "embedding")
    // index B: the staleness contract's reference — SAME centroids
    // (copied from A's fit), assignment table written in one shot over
    // the union; equality proves an append is exactly a union re-index
    // under the original centroids
    val cents = spark.read.parquet(s"$grown/centroids")
    cents.write.parquet(s"$oneshot/centroids")
    Similarity.assignCorpusCells(fitted.unionByName(batch), "vec_id",
        "embedding", broadcast(cents))
      .select($"vec_id", $"__v".as("embedding"), $"cell")
      .write.partitionBy("cell").parquet(s"$oneshot/assigned")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"),
        r.getAs[Int]("rank"))).toSet
    val after = rows(Similarity.ivfTopKIndexed(spark, grown, qs,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val union = rows(Similarity.ivfTopKIndexed(spark, oneshot, qs,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(after == union)
    // appended vectors are actually retrievable: an appended vector's
    // own embedding (probed under a fresh id — search excludes
    // self-pairs) returns that vector at rank 1, cosine 1
    val wanted = batch.orderBy($"vec_id").limit(1)
    val probe = wanted.withColumn("vec_id", lit(999999L))
    val hit = Similarity.ivfTopKIndexed(spark, grown, probe,
        "vec_id", "embedding", k = 1, nprobe = 1)
      .collect().head
    val wantedId = wanted.select("vec_id").head.getLong(0)
    assert(hit.getAs[Long]("neighbor_id") == wantedId
      && math.abs(hit.getAs[Double]("cosine") - 1.0) < 1e-12,
      s"appended vector must be found by its own embedding: $hit")
  }

  test("IVF top-k cosines match brute-force scores for shared pairs") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 4)
    val bf = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 500)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k = 3, nCells = 8).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bf.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12))
    }
  }

  test("resampleToMix hits the target mix: binding stratum keeps all, others downsample") {
    import graft.llmdata.Sampling
    // A: 200 rows, B: 10 rows; targets 50/50 → K = min(400, 20) = 20:
    // B is binding (rate 1.0, all kept), A keeps ~10 in expectation
    val df = ((1L to 200L).map(i => (i, "A")) ++ (1001L to 1010L).map(i => (i, "B")))
      .toDF("doc_id", "src")
    val kept = Sampling.resampleToMix(df, "doc_id", "src",
      Map("A" -> 0.5, "B" -> 0.5)).collect()
    val byStratum = kept.groupBy(_.getAs[String]("src")).view.mapValues(_.length).toMap
    assert(byStratum.getOrElse("B", 0) == 10, "binding stratum keeps every row")
    val nA = byStratum.getOrElse("A", 0)
    assert(nA > 0 && nA < 50, s"A must downsample toward ~10 rows, got $nA")
    // deterministic: a second run returns the identical set
    val again = Sampling.resampleToMix(df, "doc_id", "src",
      Map("A" -> 0.5, "B" -> 0.5)).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == kept.map(_.getAs[Long]("doc_id")).toSet)
    // untargeted strata are dropped entirely
    val withC = df.union(Seq((2000L, "C")).toDF("doc_id", "src"))
    val keptC = Sampling.resampleToMix(withC, "doc_id", "src",
      Map("A" -> 0.5, "B" -> 0.5)).collect().map(_.getAs[String]("src")).toSet
    assert(!keptC.contains("C"))
  }

  test("splitAssign is total, growth-stable, and roughly weight-proportioned") {
    import graft.llmdata.Sampling
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.splitAssign(docs, "doc_id", splits, salt = "v1")
      .select("doc_id", "split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a.size == docs.count(), "every row gets exactly one split")
    val shares = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(math.abs(shares("train") - 0.8) < 0.08, s"train share ${shares("train")}")
    assert(shares.keySet == Set("train", "val", "test"))
    // growth stability: assignments on a subset are the restriction of
    // the full assignment (the anti-bleed property)
    val sub = Sampling.splitAssign(docs.filter($"doc_id" < 100), "doc_id", splits, "v1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(sub.forall { case (id, s) => a(id) == s })
  }

  test("splitByCluster keeps near-dup clusters whole; singletons match splitAssign") {
    import graft.llmdata.Sampling
    val base = (1 to 20).map(i => s"t$i").mkString(" ")
    val other = (1 to 20).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (7L, base),       // one exact-dup cluster
      (3L, other), (4L, other),                 // a second cluster
      (5L, "u1 u2 u3 u4 u5"), (6L, "w1 w2 w3 w4 w5") // unpaired
    ).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val clusters = DedupOps.nearDupClusters(DedupOps.minhashLsh(
      docs, "doc_id", "text", jaccardThreshold = 0.4))
    val out = Sampling.splitByCluster(docs, "doc_id", clusters, splits, "v1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(out.size == 7)
    assert(out(1L) == out(2L) && out(2L) == out(7L),
      s"cluster {1,2,7} must land whole: $out")
    assert(out(3L) == out(4L), s"cluster {3,4} must land whole: $out")
    // zero leakage over the pair graph (the property q101 audits for)
    val pairs = DedupOps.minhashLsh(docs, "doc_id", "text",
        jaccardThreshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && pairs.forall { case (a, b) => out(a) == out(b) })
    // singletons hash their own id — identical to plain splitAssign
    val plain = Sampling.splitAssign(docs.filter($"doc_id".isin(5L, 6L)),
        "doc_id", splits, "v1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(out(5L) == plain(5L) && out(6L) == plain(6L))
  }

  test("vocabDrift classifies new/gone/rising/falling/stable exactly") {
    // equal totals (11 tokens each) make fpm ratios equal count ratios
    val oldDf = Seq((1L, "s s s s r f f f f g g")).toDF("doc_id", "text")
    val newDf = Seq((2L, "s s s s r r r r f n n")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabDrift(oldDf, newDf, "doc_id", "text",
        minCount = 2, risingAt = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(5)))).toMap
    assert(out == Map(
      "s" -> ((4L, 4L, "stable")),
      "r" -> ((1L, 4L, "rising")),
      "f" -> ((4L, 1L, "falling")),
      "g" -> ((2L, 0L, "gone")),
      "n" -> ((0L, 2L, "new"))), s"got $out")
  }

  test("bigram continuation probabilities sum to 1 over each head's full table") {
    val docs = Seq(
      (1L, "a b a b a c"),   // bigrams: a→b ×2, b→a ×2, a→c ×1
      (2L, "a b")            // a→b ×1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramTopContinuations(docs, "doc_id", "text",
      k = 10, minHeadCount = 1).collect()
    val aRows = out.filter(_.getAs[String]("head") == "a")
    assert(aRows.map(r => (r.getAs[String]("cont"), r.getAs[Long]("n_bigram"))).toSet ==
      Set(("b", 3L), ("c", 1L)))
    assert(aRows.map(_.getAs[Double]("p")).sum == 1.0, "full table sums to 1 exactly")
    assert(aRows.find(_.getAs[String]("cont") == "b").get.getAs[Int]("rank") == 1)
  }

  test("shuffleShard is a reproducible dense permutation; exportShards writes ordered JSONL") {
    import graft.llmdata.Sampling
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    def run(salt: String) = Sampling.shuffleShard(docs, "doc_id", 4, salt)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("shard"), r.getAs[Long]("position")))).toMap
    val a = run("s1")
    assert(a.size == n, "every doc appears exactly once")
    // positions are dense 1..|shard| within each shard
    a.values.groupBy(_._1).foreach { case (shard, rows) =>
      assert(0 <= shard && shard < 4)
      assert(rows.map(_._2).toSeq.sorted == (1L to rows.size).toSeq)
    }
    assert(run("s1") == a, "same salt reproduces the permutation")
    assert(run("s2") != a, "a new salt is a fresh permutation")

    val path = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/out"
    Sampling.exportShards(docs.select("doc_id", "text"), "doc_id", 4, path, salt = "s1")
    assert(spark.read.json(path).count() == n, "JSONL round-trips every row")
    val shardDirs = new java.io.File(path).listFiles().filter(_.isDirectory)
    assert(shardDirs.nonEmpty && shardDirs.forall(_.getName.startsWith("shard=")))
    // within each output file, lines ride in shuffled (position) order
    shardDirs.foreach { dir =>
      dir.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
        val ids = scala.io.Source.fromFile(f).getLines()
          .map(l => ujsonDocId(l)).toSeq
        val ps = ids.map(id => a(id)._2)
        assert(ps == ps.sorted, s"lines in ${f.getName} must be position-ordered")
      }
    }
  }

  /** Minimal doc_id extractor for a one-level JSON object line. */
  private def ujsonDocId(line: String): Long = {
    val m = """"doc_id"\s*:\s*(\d+)""".r.findFirstMatchIn(line)
    m.get.group(1).toLong
  }

  test("scrubBoilerplate removes frequent-span tokens, leaves unique docs intact") {
    val fixture = Seq(
      (1L, "aaa bbb ccc unique1 xxx"),        // boilerplate at head
      (2L, "zzz aaa bbb ccc yyy"),            // boilerplate mid-doc
      (3L, "totally different words here")    // no boilerplate
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplate(fixture, "doc_id", "text", n = 3, minDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"))))
      .toMap
    assert(out(1L) == (("unique1 xxx", 5L, 3L)))
    assert(out(2L) == (("zzz yyy", 5L, 3L)))
    assert(out(3L) == (("totally different words here", 4L, 0L)))
  }

  test("scrubBoilerplate covers overlapping frequent spans exactly once per token") {
    // "a b c d" in both docs: frequent 3-grams "a b c" (pos 0) and
    // "b c d" (pos 1) overlap on b,c — each token removed once, no
    // double-count in n_removed
    val fixture = Seq(
      (1L, "a b c d tail1"),
      (2L, "head2 a b c d")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplate(fixture, "doc_id", "text", n = 3, minDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    assert(out(1L) == (("tail1", 4L)))
    assert(out(2L) == (("head2", 4L)))
  }

  test("semanticDedup keeps one embedding per transitive cosine cluster") {
    // 1 ≈ 2 ≈ 3 (identical + tiny perturbation: same bucket, cosine ≈ 1);
    // 4 is the sign-flipped pattern — complementary bucket (Hamming 8,
    // never paired) and strongly negative cosine
    val a = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val a3 = a.clone(); a3(2) = 0.9f
    val vecs = Seq(1L -> a, 2L -> a.clone(), 3L -> a3, 4L -> a.map(-_))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.8, bits = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(kept == Set(1L, 4L),
      "cluster {1,2,3} keeps its min id; the unpaired vector survives")
  }

  test("semanticDecontaminate flags corpus vectors near a benchmark item") {
    val b = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val nearSameBucket = b.clone(); nearSameBucket(2) = 0.9f
    // one hyperplane flipped: lands in a Hamming-1 bucket — only the
    // multi-probe fan-out can find it
    val nearFlipped = b.clone(); nearFlipped(0) = -0.05f; nearFlipped(1) = 0.0f
    val far = b.map(-_)
    val benchmark = Seq(1L -> b).toDF("vec_id", "embedding")
    val corpus = Seq(100L -> nearSameBucket, 101L -> nearFlipped, 102L -> far)
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, benchmark,
      "vec_id", "embedding", threshold = 0.5, bits = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_benchmark_hits")).toMap
    assert(out.keySet == Set(100L, 101L),
      "same-bucket and flipped-hyperplane neighbors flagged, far vector not")
    assert(out.values.forall(_ == 1L))
  }

  test("dedupCorpus keeps cluster keepers and unpaired docs") {
    val out = DedupOps.dedupCorpus(docs, "doc_id", "text", jaccardThreshold = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // {1,2} cluster → keeper 1 kept, exact dup 2 dropped; 3 (no band
    // collision at these LSH params) and 4 are unpaired and survive
    assert(out == Set(1L, 3L, 4L))
    assert(!out.contains(2L), "the non-keeper duplicate must be dropped")
  }

  test("dedupCorpusBy keeps the highest-priority cluster member, not the min id") {
    val base = (1 to 20).map(i => s"t$i").mkString(" ")
    val fixture = Seq(
      (1L, base),              // near-dup of 2, SHORTER
      (2L, base + " extra"),   // longest copy: the priority keeper
      (3L, (1 to 10).map(i => s"u$i").mkString(" ")) // unpaired
    ).toDF("doc_id", "text")
    val best = DedupOps.dedupCorpusBy(fixture, "doc_id", "text",
        priority = length(col("text")), jaccardThreshold = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 3L),
      s"longest member wins under the length priority: $best")
    val minId = DedupOps.dedupCorpus(fixture, "doc_id", "text",
        jaccardThreshold = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 3L), "min-id keeper keeps doc 1 on the same corpus")
  }

  test("incrementalDedup admits only batch docs that dup neither corpus nor earlier batch") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely here unrelated content")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // dup of corpus 1 → dropped
      (11L, "some genuinely novel sentence with new vocabulary throughout"),
      (12L, "some genuinely novel sentence with new vocabulary throughout") // dup of 11 → dropped
    ).toDF("doc_id", "text")
    val admitted = DedupOps.incrementalDedup(corpus, batch, "doc_id", "text",
      jaccardThreshold = 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(11L))
    // corpus is never re-paired against itself: an all-dup corpus stays intact
    val dupCorpus = corpus.unionByName(Seq((3L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text"))
    val none = DedupOps.incrementalDedup(dupCorpus,
      Seq((20L, "fresh material only")).toDF("doc_id", "text"),
      "doc_id", "text", jaccardThreshold = 0.3)
    assert(none.count() == 1) // batch survives; corpus dups are not its problem
  }

  test("indexed incremental dedup ≡ self-contained, and append keeps the index current") {
    val docsSf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docsSf.filter($"doc_id" < 250)
    val batch = docsSf.filter($"doc_id" >= 250 && $"doc_id" < 350)
    val path = java.nio.file.Files.createTempDirectory("graft-sig").toString + "/idx"
    DedupOps.signatureWrite(corpus, "doc_id", "text", path)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = ids(DedupOps.incrementalDedup(corpus, batch, "doc_id", "text",
      jaccardThreshold = 0.4))
    val indexed = ids(DedupOps.incrementalDedupIndexed(spark, path, batch,
      "doc_id", "text", jaccardThreshold = 0.4))
    assert(indexed == direct, "stored-signature path must equal the self-contained path")
    // append the admitted batch, then a second batch must be deduped
    // against corpus ∪ admitted — exactly the self-contained result over
    // the grown corpus
    val admitted = batch.join(
      docsSf.sparkSession.createDataset(indexed.toSeq).toDF("doc_id"), Seq("doc_id"))
    DedupOps.signatureAppend(admitted, "doc_id", "text", path)
    val batch2 = docsSf.filter($"doc_id" >= 350 && $"doc_id" < 400)
    val direct2 = ids(DedupOps.incrementalDedup(corpus.unionByName(admitted), batch2,
      "doc_id", "text", jaccardThreshold = 0.4))
    val indexed2 = ids(DedupOps.incrementalDedupIndexed(spark, path, batch2,
      "doc_id", "text", jaccardThreshold = 0.4))
    assert(indexed2 == direct2, "appended index must dedup against corpus ∪ admitted")
  }

  test("tombstoned corpus docs stop suppressing batches; compact purges them") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely here unrelated content")
    ).toDF("doc_id", "text")
    val batch = Seq( // dup of corpus doc 1 — suppressed while 1 is live
      (10L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-sig-tb").toString + "/idx"
    DedupOps.signatureWrite(corpus, "doc_id", "text", path)
    def admitted() = DedupOps.incrementalDedupIndexed(spark, path, batch,
      "doc_id", "text", jaccardThreshold = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted() == Set.empty[Long], "live corpus dup suppresses the batch")
    DedupOps.signatureDelete(Seq(1L).toDF("doc_id"), "doc_id", path)
    assert(admitted() == Set(10L), "tombstoned content must stop suppressing")
    // compact: physical purge, tombstone list cleared, behavior unchanged
    DedupOps.signatureCompact(spark, path)
    assert(!new java.io.File(s"$path/tombstones").exists(), "tombstones cleared")
    val liveIds = spark.read.parquet(s"$path/shingles")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(liveIds == Set(2L), "purged doc's rows are physically gone")
    assert(admitted() == Set(10L), "compaction preserves read semantics")
  }

  test("contamination flags corpus docs overlapping the benchmark set") {
    val benchmark = Seq((1L, "the capital of france is paris")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "we know the capital of france is paris indeed"), // contaminated
      (11L, "the capital city gets mentioned once of france"), // 1 shared 3-gram
      (12L, "entirely unrelated content about boats")
    ).toDF("doc_id", "text")
    val flagged = DedupOps.contamination(corpus, benchmark, "doc_id", "text",
        shingleSize = 3, minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(10L) && flagged(10L) >= 2)
    assert(!flagged.contains(11L) && !flagged.contains(12L))
  }

  test("mix report shares sum to one and count tokens exactly") {
    val docs = Seq(
      (1L, "en", "one two three"), (2L, "en", "four five"),
      (3L, "de", "eins zwei drei vier five")).toDF("doc_id", "lang", "text")
    val rep = TextAnalysis.mixReport(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rep("en") == ((2L, 5L, 0.5)) && rep("de") == ((1L, 5L, 0.5)))
  }

  test("stratified sampling is deterministic and rate-ordered") {
    val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s = graft.llmdata.Sampling.stratifiedSample(rows, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.1), defaultRate = 0.25)
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic: the same sample twice
    assert(s.collect().toSet == graft.llmdata.Sampling.stratifiedSample(rows,
      "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.1), 0.25).collect().toSet)
    // rates order the strata (200 docs each: en @ .5 ≫ de @ .1)
    assert(counts("en") > counts("de"))
    val perN = graft.llmdata.Sampling.perStratumSample(rows, "doc_id", "lang", n = 7)
    assert(perN.groupBy("lang").count().collect().forall(_.getLong(1) == 7L))
  }

  test("PII redaction tags emails and long digit runs, leaves prose alone") {
    val out = Seq((1L, "mail me at jo.doe+x@corp.example.com or call 12345678 ok 123"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.redactPii($"text").as("r")).first().getString(0)
    assert(out == "mail me at [EMAIL] or call [NUMBER] ok 123")
  }

  test("token chunking covers every token with the configured overlap") {
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val chunks = TextAnalysis.chunkByTokens(
        Seq((1L, text), (2L, "tiny doc")).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 32, stride = 24)
      .orderBy("doc_id", "chunk_index").collect()
    val c1 = chunks.filter(_.getLong(0) == 1L)
    // 80 tokens, window 32, stride 24 → ceil((80-32)/24)=2 extra chunks:
    // starts 1, 25, 49 — the third window (49..80) reaches the last token
    assert(c1.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(32L, 32L, 32L))
    assert(c1.head.getAs[String]("chunk_text").startsWith("w1 w2 "))
    assert(c1.last.getAs[String]("chunk_text") == (49 to 80).map("w" + _).mkString(" "))
    // a doc shorter than one window yields exactly one (short) chunk
    assert(chunks.count(_.getLong(0) == 2L) == 1)
  }

  test("sequence packing fills bins to the budget in id order per shard") {
    // 6 docs of 100 tokens each, one shard → budget 250 packs 2.5 docs/bin
    val docs = (1L to 6L).map(i => (i, (1 to 100).map(j => "t").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text",
        budgetTokens = 250, nShards = 1)
      .orderBy("doc_id").collect().map(_.getAs[Long]("bin_id")).toSeq
    // prefix sums 0,100,200,300,400,500 → bins 0,0,0,1,1,2
    assert(packed == Seq(0L, 0L, 0L, 1L, 1L, 2L))
  }

  test("tfidf top terms rank a doc's distinctive word first") {
    val corpus = Seq(
      (1L, "apple banana common common"),
      (2L, "cherry banana common common"),
      (3L, "durian elderberry common common")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    // 'common' appears everywhere (df=3) → low idf; the unique fruit wins
    assert(top(1L) == "apple" && top(2L) == "cherry")
  }

  test("multimodal: mapPartitions codec path agrees with the expression path") {
    val media = Multimodal.fromDocuments(
      Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text"), "doc_id", "text")
    val viaCodec = Multimodal.decodeWithCodec(media).collect()
      .map(f => f.asset_id -> (f.byte_len, f.checksum)).toMap
    val viaExpr = Multimodal.decodeFeatures(media)
      .select("asset_id", "byte_len", "checksum").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(viaCodec == viaExpr)
  }

  test("multimodal: imageio codec decodes a real generated PNG, stub-falls-back on text") {
    // a real 3x2 PNG: left column black, middle gray(120), right white
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2) {
      img.setRGB(0, y, 0x000000)
      img.setRGB(1, y, 0x787878) // 120,120,120
      img.setRGB(2, y, 0xffffff)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    val media = Seq((1L, png), (2L, "just text bytes".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    // default decodeWithCodec path: real dims for the PNG, stub for text
    val decoded = Multimodal.decodeWithCodec(media).collect()
      .map(f => f.asset_id -> f).toMap
    assert(decoded(1L).width == 3 && decoded(1L).height == 2)
    assert(decoded(2L).width == "just text bytes".length % 1024 + 1) // stub fallback
    // pixel stats: mean luma over {0,120,255} columns = 125.0 exactly
    val stats = Multimodal.imageStats(media).collect().map(s => s.asset_id -> s).toMap
    assert(stats(1L).decoded && stats(1L).width == 3 && stats(1L).height == 2)
    assert(stats(1L).mean_luma == 125.0)
    assert(!stats(2L).decoded && stats(2L).mean_luma.isNaN)
  }

  test("multimodal: audio codec decodes a real generated WAV, flags non-audio") {
    import javax.sound.sampled._
    // 8 kHz mono 16-bit PCM: 800 frames of a 400 Hz sine at amplitude 0.5
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (0.5 * math.sin(2 * math.Pi * 400 * i / 8000.0) * 32767).toInt
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    val media = Seq((1L, buf.toByteArray), (2L, "not audio at all".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val stats = Multimodal.audioStats(media).collect().map(s => s.asset_id -> s).toMap
    assert(stats(1L).decoded)
    assert(stats(1L).sample_rate == 8000 && stats(1L).channels == 1)
    assert(stats(1L).n_frames == n.toLong)
    // mean |0.5·sin| = 0.5·2/π ≈ 0.3183 (quantization keeps it within 1%)
    assert(math.abs(stats(1L).mean_abs_amplitude - 0.3183) < 0.005,
      s"got ${stats(1L).mean_abs_amplitude}")
    assert(!stats(2L).decoded && stats(2L).mean_abs_amplitude.isNaN)
  }

  test("multimodal: audioSilenceProfile finds silent runs and peak energy") {
    import javax.sound.sampled._
    // 8 kHz mono 16-bit: 256 silent frames, 512 loud frames (amp 0.5),
    // 256 silent frames → with 256-frame windows: S L L S
    val n = 1024
    val pcm = new Array[Byte](n * 2)
    for (i <- 256 until 768) {
      val s = (0.5 * math.sin(2 * math.Pi * 400 * i / 8000.0) * 32767).toInt
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    val media = Seq((1L, buf.toByteArray), (2L, "not audio".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val out = Multimodal.audioSilenceProfile(media, windowFrames = 256)
      .collect().map(s => s.asset_id -> s).toMap
    val p = out(1L)
    assert(p.decoded && p.n_windows == 4L && p.n_silent == 2L)
    assert(p.silence_fraction == 0.5)
    assert(p.leading_silent == 1L && p.trailing_silent == 1L)
    // loud window RMS of a 0.5-amp sine ≈ 0.5/√2 ≈ 0.354
    assert(math.abs(p.peak_rms - 0.3536) < 0.01, s"peak ${p.peak_rms}")
    assert(!out(2L).decoded && out(2L).peak_rms.isNaN)
  }

  test("multimodal: videoContainerMeta parses a crafted MP4 box tree") {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(payload.length + 8) // big-endian
      bb.putInt(payload.length + 8).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    // mvhd v0: timescale 1000 @ +12, duration 90000 @ +16, padded to the
    // real 100-byte payload
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.position(12); bb.putInt(1000); bb.putInt(90000)
      bb.array()
    }
    // tkhd v0 (84-byte payload): width<<16 @ +76, height<<16 @ +80
    def tkhd(w: Int, h: Int) = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.position(76); bb.putInt(w << 16); bb.putInt(h << 16)
      bb.array()
    }
    val moov = box("moov", box("mvhd", mvhd) ++
      box("trak", box("tkhd", tkhd(0, 0))) ++        // audio track, 0×0
      box("trak", box("tkhd", tkhd(640, 360))))      // video track
    val mp4 = box("ftyp", "isom    isom".getBytes("ISO-8859-1")) ++
      moov ++ box("mdat", Array.fill[Byte](32)(7))
    val media = Seq(
      (1L, mp4),
      (2L, "definitely not a video".getBytes("UTF-8")),
      (3L, mp4.dropRight(mp4.length - 40))           // truncated mid-moov
    ).toDF("asset_id", "payload")
    val out = Multimodal.videoContainerMeta(media)
      .collect().map(v => v.asset_id -> v).toMap
    assert(out(1L).parsed && out(1L).container == "mp4")
    assert(out(1L).duration_ms == 90000L, s"got ${out(1L).duration_ms}")
    assert(out(1L).n_tracks == 2)
    assert(out(1L).width == 640 && out(1L).height == 360)
    assert(!out(2L).parsed && out(2L).container == "unknown")
    assert(!out(3L).parsed) // clean stop, no exception on truncation
  }

  test("multimodal: videoContainerMeta parses a crafted RIFF-AVI header") {
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + 8 + 4 + 8 + 56)
      .put("AVI ".getBytes("ISO-8859-1"))
    bb.put("LIST".getBytes("ISO-8859-1")).putInt(4 + 8 + 56)
      .put("hdrl".getBytes("ISO-8859-1"))
    bb.put("avih".getBytes("ISO-8859-1")).putInt(56)
    bb.putInt(33333)   // dwMicroSecPerFrame
    bb.putInt(0).putInt(0).putInt(0)
    bb.putInt(300)     // dwTotalFrames
    bb.putInt(0)
    bb.putInt(2)       // dwStreams
    bb.putInt(0)
    bb.putInt(320).putInt(240) // dwWidth, dwHeight
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    val media = Seq((1L, bb.array())).toDF("asset_id", "payload")
    val v = Multimodal.videoContainerMeta(media).collect().head
    assert(v.parsed && v.container == "avi")
    assert(v.duration_ms == 300L * 33333 / 1000) // 9999
    assert(v.n_tracks == 2 && v.width == 320 && v.height == 240)
  }

  test("multimodal: frame sampling covers the payload deterministically") {
    val media = Multimodal.fromDocuments(Seq((1L, "x" * 1000)).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.frameSample(media, chunkBytes = 64, stride = 4).collect()
    assert(frames.length == 1000 / 256 + (if (1000 % 256 > 0) 0 else 0)) // floor(1000/256)=3 frames
    val feats = Multimodal.decodeFeatures(media).first()
    assert(feats.getAs[Long]("byte_len") == 1000L)
    assert(feats.getAs[String]("checksum").length == 32)
    val resized = Multimodal.resize(media, 100).first()
    assert(resized.getAs[Array[Byte]]("payload").length == 100)
  }

  test("vectorHygiene flags null / wrong-dim / non-finite / all-zero vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)),                    // clean
      (2L, null.asInstanceOf[Array[Float]]),      // null
      (3L, Array(1.0f, 2.0f, 3.0f)),              // wrong dim
      (4L, Array(Float.NaN, 1.0f)),               // NaN
      (5L, Array(Float.PositiveInfinity, 0.0f)),  // +Inf
      (6L, Array(0.0f, 0.0f)),                    // all zero
      (7L, Array(0.0f, -1.0f))                    // clean (has a nonzero)
    ).toDF("vec_id", "embedding")
    val r = graft.llmdata.Similarity
      .vectorHygiene(vecs, "embedding", expectedDim = 2).collect()(0)
    assert(r.getAs[Long]("n_vectors") == 7L)
    assert(r.getAs[Long]("n_null") == 1L)
    assert(r.getAs[Long]("n_wrong_dim") == 1L)
    assert(r.getAs[Long]("n_nonfinite") == 2L)
    assert(r.getAs[Long]("n_all_zero") == 1L)
    assert(r.getAs[Long]("n_clean") == 2L)
    assert(r.getAs[Double]("clean_rate") == 2.0 / 7)
  }

  test("vectorHygiene counts a multi-defect vector once per flag, not as clean") {
    // wrong dim AND all-zero: flagged in both counts, never clean
    val vecs = Seq((1L, Array(0.0f, 0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = graft.llmdata.Similarity
      .vectorHygiene(vecs, "embedding", expectedDim = 2).collect()(0)
    assert(r.getAs[Long]("n_wrong_dim") == 1L)
    assert(r.getAs[Long]("n_all_zero") == 1L)
    assert(r.getAs[Long]("n_clean") == 1L)
  }

  test("lexicalConcentration computes exact moments and IEEE ratios") {
    val docs = Seq((1L, "w w w"), (2L, "a b c"), (3L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalConcentration(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 3L && out(1L).getLong(2) == 1L
      && out(1L).getLong(3) == 9L)
    assert(out(1L).getDouble(4) == 1.0 && out(1L).getDouble(5) == 1.0)
    assert(out(2L).getDouble(4) == 3.0 / 9.0 && out(2L).getDouble(5) == 9.0 / 3.0)
    assert(out(3L).getLong(1) == 0L && out(3L).getDouble(4) == 0.0
      && out(3L).getDouble(5) == 0.0, "token-free docs report zeros")
  }

  test("lexicalConcentration weighs the count distribution, not just distincts") {
    // one-word-heavy doc has MORE distinct terms than the doubled doc
    // (5 vs 4, so dup_token_fraction ranks it better) yet HIGHER
    // concentration — the signal repetitionFeatures cannot see
    val docs = Seq((1L, "x x x x a b c d"), (2L, "p p q q r r s s"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lexicalConcentration(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 5L && out(2L).getLong(2) == 4L)
    assert(out(1L).getLong(3) == 20L && out(2L).getLong(3) == 16L)
    assert(out(1L).getDouble(4) > out(2L).getDouble(4))
  }

  test("gopherRules trips each rule on its own fixture") {
    val docs = Seq(
      (1L, "the cat and dog ran"),        // clean: every flag true
      (2L, "a"),                          // word count below min
      (3L, "aa bb the and"),              // mean word len < 3
      (4L, "# # # the and cat"),          // symbol ratio > 0.1
      (5L, "- a\n- b"),                   // 100% bullet lines
      (6L, "a...  \nb...\nc d e f g h"),  // 2/3 ellipsis lines > 30%
      (7L, "1 2 3 4 5"),                  // no alphabetic words
      (8L, "cat dog bird frog")           // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
      minTokens = 2, maxTokens = 100, stopwords = Seq("the", "and"),
      minStopwords = 2).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(10), "clean doc passes every rule")
    assert(!out(2L).getBoolean(3) && out(1L).getBoolean(3))
    assert(!out(3L).getBoolean(4) && out(1L).getBoolean(4))
    assert(!out(4L).getBoolean(5) && out(1L).getBoolean(5))
    assert(!out(5L).getBoolean(6) && out(1L).getBoolean(6))
    assert(!out(6L).getBoolean(7) && out(1L).getBoolean(7),
      "rtrim'd trailing spaces still count as an ellipsis line")
    assert(!out(7L).getBoolean(8) && out(1L).getBoolean(8))
    assert(!out(8L).getBoolean(9) && out(1L).getBoolean(9))
    assert(Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L).forall(i => !out(i).getBoolean(10)))
  }

  test("gopherRules boundary: thresholds are exact, not float-rounded") {
    // exactly mean word length 3 (9 chars / 3 tokens) and exactly 10%
    // symbols (1 '#' per 10 tokens) sit INSIDE the allowed region
    val docs = Seq(
      (1L, "abc def gh i"),  // 9 chars / 4 tokens... pick exact: see below
      (2L, "# the and aa bb cc dd ee ff gg")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
      minTokens = 1, maxTokens = 100, stopwords = Seq("the", "and"),
      minStopwords = 1).collect().map(r => r.getLong(0) -> r).toMap
    // doc1: 10 word chars, 4 tokens → 12 ≤ 10 is false (mean 2.5 < 3)
    assert(!out(1L).getBoolean(4))
    // doc2: 1 symbol, 10 tokens → 10·1 ≤ 10 exactly at the boundary: ok
    assert(out(2L).getBoolean(5))
  }

  test("sourceShingleOverlap: exact pair jaccard, df cap drops boilerplate") {
    val docs = Seq(
      (1L, "A", "one two three four"),     // shingles: {one two three, two three four}
      (2L, "A", "one two three"),          // dup shingle within source → distinct
      (3L, "B", "one two three five six"), // shares "one two three"
      (4L, "C", "one two three"),          // the shared shingle spans 3 sources
      (5L, "C", "totally different words here")
    ).toDF("doc_id", "source", "text")
    val out = DedupOps.sourceShingleOverlap(docs, "source", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // sizes: A=2, B=3, C=3; every pair shares exactly {one two three}
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out(("A", "B")) == ((2L, 3L, 1L, 1.0 / 4.0)))
    assert(out(("A", "C")) == ((2L, 3L, 1L, 1.0 / 4.0)))
    assert(out(("B", "C")) == ((3L, 3L, 1L, 1.0 / 5.0)))
    // cap 2 drops the 3-source boilerplate shingle → no overlap remains
    val capped = DedupOps.sourceShingleOverlap(docs, "source", "text", 3,
      maxSourcesPerShingle = Some(2))
    assert(capped.collect().isEmpty)
    // cap 3 keeps it → matrix unchanged
    val capped3 = DedupOps.sourceShingleOverlap(docs, "source", "text", 3,
      maxSourcesPerShingle = Some(3))
    assert(capped3.collect().length == 3)
  }

  test("covarianceMatrix: hand-computed upper triangle, exact sums") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)), (3L, Array(5.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.covarianceMatrix(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set((0, 0), (0, 1), (1, 1)))
    assert(out((0, 0)) == ((3L, 35.0, 35.0 / 3.0 - (9.0 / 3.0) * (9.0 / 3.0))))
    assert(out((0, 1)) == ((3L, 14.0, 14.0 / 3.0 - (9.0 / 3.0) * (6.0 / 3.0))))
    assert(out((1, 1)) == ((3L, 20.0, 20.0 / 3.0 - (6.0 / 3.0) * (6.0 / 3.0))))
  }

  test("topPrincipalComponent finds the dominant axis deterministically") {
    // variance ~100 along dim 0, ~1 along dim 1, 0 along dim 2
    val vecs = (1 to 40).map { k =>
      val a = if (k % 2 == 0) 10.0f else -10.0f
      val b = if (k % 4 < 2) 1.0f else -1.0f
      (k.toLong, Array(a, b, 0.0f))
    }.toDF("vec_id", "embedding")
    val (v1, lambda1) = Similarity.topPrincipalComponent(vecs, "vec_id", "embedding")
    assert(math.abs(v1(0)) > 0.999, s"dominant loading must be dim 0: ${v1.toSeq}")
    assert(v1(0) > 0, "sign convention: largest-|loading| dim positive")
    assert(math.abs(lambda1 - 100.0) < 1.0, s"eigenvalue ~ var(dim0): $lambda1")
    val (v2, _) = Similarity.topPrincipalComponent(vecs, "vec_id", "embedding")
    assert(v1.toSeq == v2.toSeq, "re-run must be bit-identical")
  }

  test("pseudonymizePii: stable tokens, substring-safe fold, cross-doc consistency") {
    def h8(v: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val docs = Seq(
      (1L, "ping a@b.com and xa@b.com now"),  // a@b.com substring of xa@b.com
      (2L, "call 12345678@mail.net asap"),    // digit run inside the email
      (3L, "a@b.com again"),                  // same value as doc 1
      (4L, "clean text")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pseudonymizePii(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // longer email replaced first: the short one's token must not corrupt it
    assert(out(1L).getAs[String]("scrubbed") ==
      s"ping <EMAIL_${h8("a@b.com")}> and <EMAIL_${h8("xa@b.com")}> now")
    assert(out(1L).getAs[Long]("n_pii") == 2L)
    // the digit run is listed in the map but already scrubbed inside the email
    assert(out(2L).getAs[String]("scrubbed")
      .startsWith(s"call <EMAIL_${h8("12345678@mail.net")}>"))
    assert(out(2L).getAs[Long]("n_pii") == 2L)
    assert(out(2L).getAs[String]("pii_map").contains("12345678=>"))
    // the same value pseudonymizes to the same token in a different doc
    assert(out(3L).getAs[String]("scrubbed") ==
      s"<EMAIL_${h8("a@b.com")}> again")
    // no PII: text passes through untouched
    assert(out(4L).getAs[String]("scrubbed") == "clean text")
    assert(out(4L).getAs[Long]("n_pii") == 0L)
    assert(out(4L).getAs[String]("pii_map") == "")
  }

  test("charClassProfile: every class counted exactly, residue classes split") {
    val docs = Seq(
      (1L, "Ab1 , é中"), // 2 letters, 1 digit, 2 space, 1 punct, 2 non-ASCII
      (2L, "\u0007x"),      // BEL: outside [ -~] and tab/LF/CR -> non-ASCII tail
      (3L, "")                      // empty: all zeros, guarded ratio
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charClassProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_chars") == 8L)
    assert(d1.getAs[Long]("n_letters") == 2L)
    assert(d1.getAs[Long]("n_digits") == 1L)
    assert(d1.getAs[Long]("n_space") == 2L)
    assert(d1.getAs[Long]("n_punct") == 1L)
    assert(d1.getAs[Long]("n_non_ascii") == 2L)
    assert(d1.getAs[Long]("n_other_ascii") == 0L)
    assert(d1.getAs[Double]("letter_ratio") == 2.0 / 8.0)
    // control chars below 0x20 fall in the non-ASCII (non-printable) tail
    assert(out(2L).getAs[Long]("n_non_ascii") == 1L)
    assert(out(2L).getAs[Long]("n_letters") == 1L)
    assert(out(3L).getAs[Long]("n_chars") == 0L)
    assert(out(3L).getAs[Double]("letter_ratio") == 0.0)
  }

  test("tokenFertility: exact totals and single-division rates per slice") {
    val docs = Seq(
      (1L, "en", "web", "ab cd"),        // 2 tokens, 5 chars
      (2L, "en", "web", "xyz"),          // 1 token, 3 chars
      (3L, "en", "book", ""),            // 0 tokens, 0 chars (guarded denom)
      (4L, "de", "web", "äö üß")         // 2 tokens, 5 chars, 9 UTF-8 bytes
    ).toDF("doc_id", "lang", "source", "text")
    val out = TextAnalysis.tokenFertility(docs, Seq("lang", "source"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val enWeb = out(("en", "web"))
    assert(enWeb.getAs[Long]("n_docs") == 2L)
    assert(enWeb.getAs[Long]("total_tokens") == 3L)
    assert(enWeb.getAs[Long]("total_chars") == 8L)
    assert(enWeb.getAs[Long]("total_bytes") == 8L)          // pure ASCII
    assert(enWeb.getAs[Double]("chars_per_token") == 8.0 / 3.0)
    assert(enWeb.getAs[Double]("tokens_per_doc") == 1.5)
    // multi-byte UTF-8: 4 letters × 2 bytes + 1 space = 9 bytes, 5 chars
    val deWeb = out(("de", "web"))
    assert(deWeb.getAs[Long]("total_chars") == 5L)
    assert(deWeb.getAs[Long]("total_bytes") == 9L)
    assert(deWeb.getAs[Double]("bytes_per_token") == 4.5)
    // empty doc: zero totals survive the guarded denominator
    val enBook = out(("en", "book"))
    assert(enBook.getAs[Long]("total_tokens") == 0L)
    assert(enBook.getAs[Double]("chars_per_token") == 0.0)
  }

  test("codeMixing separates monolingual, mixed, and profile-silent docs") {
    // en-only terms: 'the'=1000 (rank 1), 'that'=111 (rank 9); de-only:
    // 'der'=1000, 'und'=333 ('of' would NOT do — it is also a nl term)
    val fixture = Seq(
      (1L, "the that the"),      // pure en
      (2L, "the der und the"),   // en 2000 vs de 1333
      (3L, "zzz qqq")            // no profile hits
    ).toDF("doc_id", "text")
    val out = TextAnalysis.codeMixing(fixture, "doc_id", "text",
        TextAnalysis.profileFrame(spark))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("dominant_lang"), r.getAs[Long]("n_langs"),
          r.getAs[Long]("total_score"), r.getAs[Long]("best_score"),
          r.getAs[Double]("mixing_ratio")))).toMap
    assert(out(1L) == (("en", 1L, 2111L, 2111L, 0.0)))
    assert(out(2L) == (("en", 2L, 3333L, 2000L, 1333.0 / 3333.0)))
    assert(out(3L) == (("und", 0L, 0L, 0L, 0.0)))
  }

  test("randomProjection: basis vector reads out one sign row, scaled 1/sqrt(k)") {
    // e_0 (1 in dim 0): y_j = sign(0, j) / sqrt(4) — each output is
    // exactly ±0.5 and equals the md5-parity sign the operator defines
    val e0 = Seq((1L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(e0, "vec_id", "embedding",
        dim = 3, kOut = 4, seed = 7)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(out.size == 4 && out.values.forall(v => math.abs(v) == 0.5))
    def expectedSign(i: Int, j: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$i:$j".getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
    (0 until 4).foreach(j => assert(out(j) == expectedSign(0, j) / 2.0))
  }

  test("randomProjection is linear and seed-stable") {
    val v = Seq((1L, Array(0.5f, -1.25f, 2f))).toDF("vec_id", "embedding")
    val v2 = Seq((1L, Array(1f, -2.5f, 4f))).toDF("vec_id", "embedding")
    val y = Similarity.randomProjection(v, "vec_id", "embedding", 3, 4, seed = 9)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val y2 = Similarity.randomProjection(v2, "vec_id", "embedding", 3, 4, seed = 9)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // doubling the vector doubles every projection (exact: decimal sums)
    (0 until 4).foreach(j => assert(y2(j) == 2.0 * y(j)))
    val yAgain = Similarity.randomProjection(v, "vec_id", "embedding", 3, 4, seed = 9)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(yAgain == y, "same seed, same projection")
  }
}
