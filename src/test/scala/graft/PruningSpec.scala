package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.incremental.Writers

/** Physical-plan evidence for the scale posture: month filters on the
  * partitioned staging layout prune at the partition level (file skipping,
  * not scan+filter), and compaction bounds file counts. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("month filter on partitioned staging prunes partitions in the plan") {
    val path = Files.createTempDirectory("graft-prune").toString + "/staging"
    val rows = Seq("2024-01-10", "2024-02-10", "2024-03-10").flatMap(d =>
      (1 to 100).map(i => (s"$d 00:0${i % 6}:00", i.toDouble)))
    Writers.monthOverwrite(
      rows.toDF("s", "x").select($"s".cast("timestamp").as("tpep_pickup_datetime"), $"x"),
      path, "tpep_pickup_datetime")

    val feb = spark.read.parquet(path).filter($"pickup_month" === "2024-02")
    assert(feb.count() == 100)
    val planText = feb.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters") && planText.contains("pickup_month"),
      s"month predicate must prune partitions:\n$planText")
    // data filters must NOT mention the partition column (it never reaches
    // the row-level filter — pruning happened at planning time)
    assert(!planText.contains("PushedFilters: [IsNotNull(pickup_month"))
  }

  test("compaction rewrites a fragmented table into bounded file count") {
    val path = Files.createTempDirectory("graft-compact").toString + "/t"
    (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(20).write.parquet(path)
    assert(spark.read.parquet(path).inputFiles.length >= 20)
    Writers.compact(spark, path, targetBytes = 1L << 30)
    val after = spark.read.parquet(path)
    assert(after.inputFiles.length == 1)
    assert(after.count() == 2000)
  }
}
