package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("file-source micro-batch + watermarked tumbling window (append mode)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    def writeBatch(rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("s", "event_type", "value")
        .select($"s".cast("timestamp").as("ts"), $"event_type", $"value")
        .coalesce(1).write.mode("append").parquet(dir + "/in")
    // two files written in order (file source replays by mtime): the early
    // events first, then the watermark-advancing late event — a shuffled
    // single write would let the 02:00 file process first and drop the rest
    writeBatch(Seq(("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:02:00", "click", 2.0),
      ("2024-01-01 00:07:00", "view", 3.0)))
    Thread.sleep(1100) // distinct mtimes even on 1s-granularity filesystems
    writeBatch(Seq(("2024-01-01 02:00:00", "click", 4.0)))

    val stream = Streaming.fileStream(spark, schema, dir + "/in")
    val agg = Streaming.windowedCounts(stream, "ts", "event_type", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wincounts")
      .option("checkpointLocation", dir + "/ckpt").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("wincounts")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    // the two closed 00:00 / 00:05 windows are emitted; the 02:00 window is
    // still open (watermark semantics — I3: append emits only final windows)
    assert(out.contains(("2024-01-01 00:00:00.0", "click", 2L)))
    assert(out.contains(("2024-01-01 00:05:00.0", "view", 1L)))
    assert(!out.exists(_._1.startsWith("2024-01-01 02:")))
  }

  test("flatMapGroupsWithState emits closed session windows, keeps the open one") {
    val evs = Seq(
      Streaming.TimedEv(1L, 100), Streaming.TimedEv(1L, 130), // session A
      Streaming.TimedEv(1L, 500), Streaming.TimedEv(1L, 520), // session B
      Streaming.TimedEv(1L, 2000),                            // open session
      Streaming.TimedEv(2L, 10)                               // open session
    ).toDS()
    val out = Streaming.sessionWindows(evs, gapSeconds = 60).collect()
    val u1 = out.filter(_.userId == 1L).sortBy(_.startSec)
    assert(u1.length == 2) // A and B closed; the 2000s session stays open
    assert(u1(0) == Streaming.SessionWindow(1L, 100, 130, 2))
    assert(u1(1) == Streaming.SessionWindow(1L, 500, 520, 2))
    assert(!out.exists(_.userId == 2L)) // single open session, nothing emitted
  }

  test("sessionWindows merges a session spanning two micro-batches") {
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sess2").toString
    val in = MemoryStream[Streaming.TimedEv]
    val q = Streaming.sessionWindows(in.toDS(), gapSeconds = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess2")
      .option("checkpointLocation", dir + "/ckpt").start()
    try {
      // batch 1: an open session ending at 130
      in.addData(Streaming.TimedEv(1L, 100), Streaming.TimedEv(1L, 130))
      q.processAllAvailable()
      assert(spark.table("sess2").isEmpty) // still open, nothing emitted
      // batch 2: 150 extends it across the batch boundary; 5000 closes it
      in.addData(Streaming.TimedEv(1L, 150), Streaming.TimedEv(1L, 5000))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess2").as[Streaming.SessionWindow].collect()
    // the merged 100..150 session (3 events) is emitted exactly once
    assert(out.toSeq == Seq(Streaming.SessionWindow(1L, 100, 150, 3)))
  }

  test("watermarked stream-stream interval join attributes clicks to impressions") {
    val dir = Files.createTempDirectory("graft-ssjoin").toString
    Seq((1L, 7L, "2024-01-01 00:00:00"), (2L, 8L, "2024-01-01 01:00:00"))
      .toDF("imp_id", "imp_user", "s")
      .select($"imp_id", $"imp_user", $"s".cast("timestamp").as("imp_ts"))
      .coalesce(1).write.parquet(dir + "/imp")
    Seq((10L, 7L, "2024-01-01 00:03:00"),   // within 5 min of imp 1 → match
        (11L, 7L, "2024-01-01 00:30:00"),   // too late → no match
        (12L, 9L, "2024-01-01 00:01:00"))   // wrong user → no match
      .toDF("clk_id", "clk_user", "s")
      .select($"clk_id", $"clk_user", $"s".cast("timestamp").as("clk_ts"))
      .coalesce(1).write.parquet(dir + "/clk")

    val impSchema = spark.read.parquet(dir + "/imp").schema
    val clkSchema = spark.read.parquet(dir + "/clk").schema
    val joined = Streaming.streamIntervalJoin(
      Streaming.fileStream(spark, impSchema, dir + "/imp"),
      Streaming.fileStream(spark, clkSchema, dir + "/clk"),
      "imp_user", "clk_user", "imp_ts", "clk_ts",
      within = "5 MINUTES", lateness = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attributed")
      .option("checkpointLocation", dir + "/ckpt").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("attributed")
      .select("imp_id", "clk_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("mapGroupsWithState sessionization accumulates per-user state") {
    val evs = Seq(Streaming.Ev(1L, 1.0), Streaming.Ev(1L, 2.0), Streaming.Ev(2L, 5.0)).toDS()
    val out = Streaming.sessionize(evs).collect().map(s => s.userId -> s).toMap
    assert(out(1L).nEvents == 2 && out(1L).totalValue == 3.0)
    assert(out(2L).nEvents == 1 && out(2L).totalValue == 5.0)
  }
}
