package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for the queries whose scale
  * posture matters most (pushdown, pruning, join strategy, codegen spans).
  * Usage: runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_bronze_project", "q02_silver_clean", "q04_gold_monthly",
        "q26_join_enrich", "q27_star_join", "q36_cosine_top1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
