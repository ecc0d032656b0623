package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSim, DotProduct, GraftExtensions}

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("fused cosine is bit-identical to the three-DotProduct composition") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("embedding").as("b"), col("vec_id").as("id2")))
      .filter(col("vec_id") < 20 && col("id2") < 20)
    def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      import DotProduct.dot_product
      dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))
    }
    val checked = pairs.select(
      CosineSim.cosine_sim(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("composed"))
    // bit-level comparison: NaN != NaN under =!=, so compare raw bits
    assert(checked.filter(
      expr("cast(fused as string) != cast(composed as string)")).isEmpty)
    // and there are genuinely equal non-trivial values in the fixture
    assert(checked.filter(col("fused") === col("composed")).count() > 300)
  }

  test("zero-norm input reproduces the composed form's non-finite value") {
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),   // 0/(0*norm) = NaN
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))    // 1/(1*1) = 1.0
    ).toDF("a", "b")
    val out = df.select(CosineSim.cosine_sim(col("a"), col("b")).as("c")).collect()
    assert(out(0).getDouble(0).isNaN, "zero vector stays NaN (callers guard)")
    assert(out(1).getDouble(0) == 1.0)
  }

  test("null array and null element both yield NULL") {
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (None, Some(Seq(Some(1.0f), Some(1.0f)))),
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f))))
    ).toDF("a", "b")
    val out = df.select(CosineSim.cosine_sim(col("a"), col("b")).as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))) == 0.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("SQL registration via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(7.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").first()
    assert(r.getDouble(0) == 1.0)
  }

  test("ragged arrays raise instead of silently truncating") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(CosineSim.cosine_sim(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")))
  }
}
