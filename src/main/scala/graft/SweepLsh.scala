package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: sweep the MinHash-LSH operating point (bands × rows) over
  * the bench corpus and print pair counts + wall time per combination —
  * the measured basis for choosing production parameters (NOTES.md).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.SweepLsh
  */
object SweepLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.read(spark, sfDir, "documents")
    println(s"docs=${docs.count()}")
    for ((b, r) <- Seq((4, 2), (8, 2), (4, 4), (8, 4), (16, 4))) {
      val t0 = System.nanoTime()
      val n = graft.llmdata.DedupOps
        .minhashLsh(docs, "doc_id", "text", 3, b, r, 0.4).count()
      println(f"SWEEP bands=$b rows=$r pairs=$n secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
