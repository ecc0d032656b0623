package graft

import org.apache.spark.sql.functions._
import graft.functions.{DotProduct, GraftExtensions}
import graft.llmdata.Similarity

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product is bit-identical to the HOF and unrolled forms") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("embedding").as("b"), col("vec_id").as("id2")))
      .filter(col("vec_id") < 20 && col("id2") < 20)
    val checked = pairs.select(
      DotProduct.dot_product(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("hof"),
      Similarity.dotFixed(col("a"), col("b"), 64).as("unrolled"))
    assert(checked.filter(col("native") =!= col("hof") ||
      col("native") =!= col("unrolled")).isEmpty)
  }

  test("null array and null element both yield NULL (HOF parity)") {
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (None, Some(Seq(Some(1.0f), Some(1.0f)))),
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f))))
    ).toDF("a", "b")
    val out = df.select(DotProduct.dot_product(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("SQL registration via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d").first()
    assert(r.getDouble(0) == 9.0)
  }

  test("ragged arrays raise instead of silently truncating") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(DotProduct.dot_product(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")))
  }

  test("type mismatch is rejected at analysis time") {
    val df = Seq((Seq("x"), Seq(1.0f))).toDF("a", "b")
    intercept[Exception] {
      df.select(DotProduct.dot_product(col("a"), col("b"))).collect()
    }
  }
}
