package graft

import org.apache.spark.sql.functions._
import graft.incremental.Writers

/** Bucketed co-located join: writing both sides bucketed+sorted by the join
  * key lets Spark plan the join with NO shuffle exchange on either side. */
class BucketSpec extends SparkSpec {
  import spark.implicits._

  test("join of two equally-bucketed tables plans without a shuffle") {
    Seq("bkt_left", "bkt_right").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      new scala.reflect.io.Directory(new java.io.File(s"/tmp/graft-warehouse/$tbl"))
        .deleteRecursively()
    }
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Writers.bucketedWrite(left, "bkt_left", Seq("k"), buckets = 8)
    Writers.bucketedWrite(right, "bkt_right", Seq("k"), buckets = 8)

    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle, got plan:\n$plan")
  }
}
