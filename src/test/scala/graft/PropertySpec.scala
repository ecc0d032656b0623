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

  test("cusum closed form equals the textbook recursion on random series") {
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.choose(0, 20)),
      Gen.choose(0L, 3000000L))
    samples(gen).foreach { case (counts, slack) =>
      val M = 1000000L
      val ev = counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(("k", java.sql.Timestamp.valueOf(
          f"2024-01-${i % 28 + 1}%02d 12:00:00"))) }
      if (ev.nonEmpty) {
        val out = graft.operators.Timeseries
          .cusum(ev.toDF("k", "ts"), "k", "ts", slack, 1000000L)
          .orderBy("day").collect()
        // reference recursion over the SAME gap-filled series
        val series = out.map(_.getLong(2))
        val target = series.sum * M / series.length
        var sp = 0L; var sn = 0L
        val expect = series.map { c =>
          sp = math.max(0L, sp + (c * M - target - slack))
          sn = math.max(0L, sn + (target - c * M - slack))
          (sp, sn)
        }
        assert(out.map(r => (r.getLong(3), r.getLong(4))).toSeq == expect.toSeq)
      }
    }
  }

  test("prorate: shares always sum back exactly and never go negative") {
    val lineGen = Gen.nonEmptyListOf(Gen.choose(0.0, 99.0))
    val gen = Gen.zip(lineGen, Gen.choose(0.01, 99999.99))
    samples(gen).foreach { case (weights, total) =>
      val lines = weights.zipWithIndex.map { case (w, i) =>
        (1L, i.toLong, BigDecimal(w).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
      val headers = Seq((1L, BigDecimal(total).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
      val out = graft.operators.Allocate.prorate(
        lines.toDF("k", "line", "w"), headers.toDF("k", "total"),
        "k", "line", "w", "total").collect()
      val tm = (BigDecimal(headers.head._2).setScale(6,
        BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact
      assert(out.map(_.getAs[Long]("allocated_micro")).sum == tm,
        s"shares must sum exactly to $tm")
      assert(out.length == lines.length)
    }
  }

  test("businessDaysBetween matches a brute-force weekday walk") {
    val gen = Gen.zip(Gen.choose(0, 3000), Gen.choose(-40, 400))
    val base = java.time.LocalDate.of(2020, 1, 6) // a Monday
    samples(gen).foreach { case (off, span) =>
      val s = base.plusDays(off.toLong)
      val e = s.plusDays(span.toLong)
      // brute force: count weekdays in (s, e] (negative spans mirror)
      def walk(a: java.time.LocalDate, b: java.time.LocalDate): Long =
        Iterator.iterate(a.plusDays(1))(_.plusDays(1))
          .takeWhile(!_.isAfter(b))
          .count(d => d.getDayOfWeek.getValue <= 5).toLong
      val expect = if (span >= 0) walk(s, e) else -walk(e, s)
      val got = Seq((java.sql.Date.valueOf(s), java.sql.Date.valueOf(e)))
        .toDF("s", "e")
        .select(graft.functions.ScalarFns
          .businessDaysBetween(col("s"), col("e")).as("b"))
        .head().getLong(0)
      assert(got == expect, s"$s -> $e: got $got, expected $expect")
    }
  }

  test("temporalSplit: per-entity test quota is exactly floor(n*pct/100), latest rows") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 27)))
    samples(gen).foreach { rows =>
      val ev = rows.zipWithIndex.map { case ((u, d), i) =>
        (i.toLong, u, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00")) }
      val out = graft.llmdata.Sampling
        .temporalSplit(ev.toDF("event_id", "user_id", "ts"),
          "user_id", "ts", "event_id", testPct = 30)
        .collect().map(r => (r.getLong(1), r.getLong(0), r.getString(3)))
      out.groupBy(_._1).foreach { case (u, es) =>
        val n = es.length
        val nTest = es.count(_._3 == "test")
        assert(nTest == n * 30 / 100, s"user $u quota")
        // every test row's (ts, id) must rank strictly above every train row
        val ids = ev.filter(_._2 == u).map(e => (e._3.getTime, e._1)).sorted.reverse
        val expectTest = ids.take(nTest).map(_._2).toSet
        assert(es.filter(_._3 == "test").map(_._2).toSet == expectTest)
      }
    }
  }

  // ---- round-8 statistics: algebraic identities on random data ----------

  private def rankRows: Seq[Seq[(String, Int, Boolean)]] = samples(
    Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0, 12),
      Gen.oneOf(true, false))))

  test("MWU/KS invariants: U_A + U_B = 2 nA nB; 0 <= D_num <= nA*nB") {
    rankRows.foreach { rows =>
      val df = rows.toDF("g", "v", "s")
      graft.operators.RankStats.mannWhitneyU(df, "g", "v", col("s"))
        .collect().foreach { r =>
          assert(r.getLong(3) + r.getLong(4) == 2L * r.getLong(1) * r.getLong(2))
          assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L)
        }
      graft.operators.RankStats.ksTwoSample(df, "g", "v", col("s"))
        .collect().foreach { r =>
          assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(1) * r.getLong(2))
          assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
        }
    }
  }

  test("Kruskal-Wallis conservation: sum of doubled rank sums = n(n+1); " +
    "group sizes sum to n") {
    rankRows.foreach { rows =>
      val df = rows.map { case (g, v, s) => ("k", g + (if (s) "1" else "2"), v) }
        .toDF("key", "grp", "v")
      val out = graft.operators.RankStats.kruskalWallis(df, "key", "grp", "v")
        .collect()
      if (out.nonEmpty) {
        val n = out.head.getLong(4)
        assert(out.map(_.getLong(2)).sum == n)
        assert(out.map(_.getLong(3)).sum == n * (n + 1))
      }
    }
  }

  test("Kendall tau-b bounds and pair accounting on random grids") {
    rankRows.foreach { rows =>
      val df = rows.map { case (_, v, s) => ("k", v, if (s) v % 5 else v % 3) }
        .toDF("key", "x", "y")
      graft.operators.RankStats.kendallTau(df, "key", "x", "y")
        .collect().foreach { r =>
          val n = r.getLong(1); val n0 = n * (n - 1) / 2
          val cd = r.getLong(2) + r.getLong(3)
          assert(cd <= n0 - math.max(r.getLong(4), r.getLong(5)))
          assert(cd >= n0 - r.getLong(4) - r.getLong(5))
          if (!r.isNullAt(6))
            assert(r.getDouble(6) >= -1.0 - 1e-12 && r.getDouble(6) <= 1.0 + 1e-12)
        }
    }
  }

  test("Kaplan-Meier conservation: first at-risk = all units; exits sum to n; " +
    "n_risk strictly decreasing") {
    rankRows.foreach { rows =>
      val units = rows.map { case (_, v, s) => ("k", v.toLong, s) }
        .toDF("key", "dur", "ev")
      val out = graft.operators.Survival.kaplanMeier(units, "key", "dur", "ev")
        .orderBy(col("duration").asc).collect()
      val total = rows.size.toLong
      assert(out.head.getLong(2) == total)
      assert(out.map(r => r.getLong(3) + r.getLong(4)).sum == total)
      out.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) > b.getLong(2))
        case _ => ()
      }
    }
  }

  test("BH rejections form a rank prefix and grow monotonically with alpha") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1, 999))
    samples(gen).foreach { ps =>
      val tests = ps.distinct.zipWithIndex
        .map { case (p, i) => (s"t$i", p / 1000.0) }.toDF("id", "p")
      def rejected(alpha: Double) = graft.operators.Robust
        .benjaminiHochberg(tests, "p", alpha, Seq("id"))
        .collect().map(r => (r.getLong(2), r.getBoolean(4)))
      val r10 = rejected(0.1)
      val k = r10.filter(_._2).map(_._1).sorted
      assert(k.toSeq == (1L to k.size.toLong).toSeq) // prefix of the rank order
      val r25 = rejected(0.25).filter(_._2).map(_._1).toSet
      assert(k.toSet.subsetOf(r25))
    }
  }

  test("conformal qhat is an observed residual at the exact rational rank") {
    rankRows.foreach { rows =>
      val df = rows.map { case (_, v, _) => ("k", v.toDouble) }.toDF("g", "r")
      val out = graft.operators.Eval.conformalQuantile(df, "g", "r", 1, 5)
        .head()
      val n = out.getLong(1)
      assert(out.getLong(2) == ((n + 1) * 4 + 4) / 5)
      if (!out.isNullAt(3))
        assert(rows.map(_._2.toDouble).contains(out.getDouble(3)))
    }
  }

}
