package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ScalarFns._
import graft.operators.Dedup
import graft.llmdata.TextAnalysis

/** Property tests for the algebraic contracts SURVEY.md §5 calls out:
  * dedup idempotence, ABS/COALESCE non-negativity, decimal-sum exactness,
  * fingerprint normalization idempotence, watermark monotonicity.
  *
  * Driven by plain ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge artifact is not on the offline classpath);
  * each property is checked over `Rounds` generated datasets. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val Rounds = 6
  private def samples[T](g: Gen[T]): Seq[T] =
    (0 until Rounds).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("absCoalesce0 output is always non-negative and never null") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 5), Gen.option(Gen.choose(-500.0, 500.0))))
    samples(gen).foreach { rows =>
      val out = rows.toDF("k", "x").select(absCoalesce0($"x").as("y"))
        .agg(min($"y"), count(when($"y".isNull, 1))).first()
      assert(out.getDouble(0) >= 0.0 && out.getLong(1) == 0L)
    }
  }

  test("firstRowPerKeyTotal is idempotent and emits one row per key") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 8), Gen.choose(1, 1000)))
    samples(gen).foreach { rows =>
      val df = rows.toDF("k", "v")
      val once = Dedup.firstRowPerKeyTotal(df, Seq("k"), Seq("v"))
      val twice = Dedup.firstRowPerKeyTotal(once, Seq("k"), Seq("v"))
      assert(once.count() == rows.map(_._1).distinct.size.toLong)
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    }
  }

  test("exactSum equals decimal-exact sequential sum regardless of partitioning") {
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)), Gen.choose(1, 17))
    samples(gen).foreach { case (xs, parts) =>
      val viaSpark = xs.toDF("x").repartition(parts).agg(exactSum($"x")).first().getDouble(0)
      val local = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(viaSpark == local)
    }
  }

  test("fingerprint is invariant under pre-normalization of its input") {
    val textGen = Gen.nonEmptyListOf(
      Gen.oneOf("The", "fox ", "JUMPS,", "dog!", "  ", "42")).map(_.mkString(" "))
    samples(Gen.nonEmptyListOf(textGen)).foreach { texts =>
      val df = texts.toDF("t").select(
        TextAnalysis.fingerprint($"t").as("f1"),
        TextAnalysis.fingerprint(
          trim(regexp_replace(regexp_replace(lower($"t"), "[^a-z0-9 ]", " "), " +", " "))).as("f2"))
      assert(df.filter($"f1" =!= $"f2").isEmpty)
    }
  }

  test("chunking covers every token exactly, in order, under any window/stride") {
    val gen = Gen.zip(Gen.choose(1, 60), Gen.choose(1, 40), Gen.choose(1, 40))
    samples(gen).foreach { case (nTokens, chunk, stride0) =>
      val stride = math.min(stride0, chunk) // stride > chunk would skip tokens
      val text = (1 to nTokens).map("w" + _).mkString(" ")
      val chunks = TextAnalysis.chunkByTokens(Seq((1L, text)).toDF("id", "text"),
          "id", "text", chunk, stride)
        .orderBy("chunk_index").collect()
      // reassembling each chunk's fresh-stride prefix reproduces the doc
      val rebuilt = chunks.zipWithIndex.flatMap { case (r, i) =>
        val toks = r.getAs[String]("chunk_text").split(" ").toSeq
        if (i == chunks.length - 1) toks.drop(if (i == 0) 0 else chunk - stride)
        else toks.take(stride)
      }
      // every chunk except possibly the last is full-width
      assert(chunks.dropRight(1).forall(_.getAs[Long]("n_chunk_tokens") == chunk.toLong))
      val all = chunks.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
      assert(all == (1 to nTokens).map("w" + _).toSet, "all tokens covered")
    }
  }

  test("packing bins are contiguous, non-decreasing, and budget-bounded per shard") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1, 40))
    samples(gen).foreach { lens =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(_ => "t").mkString(" "))
      }.toDF("doc_id", "text")
      val budget = 64
      val out = TextAnalysis.packSequences(docs, "doc_id", "text", budget, nShards = 2)
        .orderBy("shard", "doc_id").collect()
      out.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
        val bins = rows.map(_.getAs[Long]("bin_id")).toSeq
        assert(bins == bins.sorted, "bins non-decreasing in doc order")
        // each bin's token total stays under budget + its last doc's size
        rows.groupBy(_.getAs[Long]("bin_id")).values.foreach { binRows =>
          val total = binRows.map(_.getAs[Long]("n_tokens")).sum
          val maxDoc = binRows.map(_.getAs[Long]("n_tokens")).max
          assert(total <= budget + maxDoc)
        }
      }
    }
  }

  test("stratified sample is always a subset and grows with the rate") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 10000L))
    samples(gen).foreach { ids =>
      val df = ids.distinct.map(i => (i, "s")).toDF("id", "g")
      def sampleIds(r: Double) =
        graft.llmdata.Sampling.stratifiedSample(df, "id", "g", Map.empty, r)
          .collect().map(_.getLong(0)).toSet
      val lo = sampleIds(0.3)
      val hi = sampleIds(0.8)
      assert(lo.subsetOf(hi), "raising the rate only adds rows")
      assert(hi.subsetOf(ids.toSet))
    }
  }

  test("strict watermark output never contains rows at or before the watermark") {
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.choose(0L, 3000000L)), Gen.choose(0L, 3000000L))
    samples(gen).foreach { case (ticks, wmTick) =>
      val src = ticks.toDF("t").select(timestamp_seconds($"t").as("ts"))
      val existing = Seq(wmTick).toDF("t").select(timestamp_seconds($"t").as("ts"))
      val out = graft.incremental.Watermark.strictlyAfterMax(src, Some(existing), "ts")
      assert(out.filter($"ts" <= timestamp_seconds(lit(wmTick))).isEmpty)
      assert(out.count() == ticks.count(_ > wmTick).toLong)
    }
  }

  test("multiTouch conserves exactly 1e6 micro-credits per conversion") {
    // random event streams: touches and conversions at random seconds
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 3L),                    // user
      Gen.choose(0L, 5000L),                 // second offset
      Gen.oneOf("view", "click", "purchase")))
    samples(gen).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((u, sec, t), i) =>
        (u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000 + sec, t, i.toLong)
      }.toDF("user_id", "epoch_s", "event_type", "event_id")
        .withColumn("ts", col("epoch_s").cast("timestamp").cast("timestamp_ntz"))
      val credited = graft.operators.Attribution.multiTouch(df,
        "user_id", "ts", "event_type", "event_id",
        Seq("view", "click"), "purchase", lookbackSeconds = 1800L,
        halfLifeSeconds = if (rows.size % 2 == 0) Some(600L) else None)
      val perConv = credited.groupBy(col("conv_id"))
        .agg(sum(col("credit_micro")).as("total")).collect()
      val nConv = rows.count(_._3 == "purchase")
      assert(perConv.length == nConv)
      assert(perConv.forall(_.getAs[Long]("total") == 1000000L),
        s"every conversion must carry exactly 1e6 micros")
    }
  }
}
