package graft

/** Driver-contract smoke: entry() returns rows; every queries entry has
  * runnable Spark code, and every oracle key points at a real query. */
class EntrySpec extends SparkSpec {

  test("entry() flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; names are aligned") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
  }

  test("every query executes at sf0.001 (schema + plan sanity)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("no query emits a DecimalType compared column (r7 driver-red class)") {
    // analysis only — no execution; the lint itself is proven on a
    // deliberately-decimal fixture below
    val bad = SparkEntry.queries.flatMap { case (name, fn) =>
      Verify.lintDecimalOutput(name, fn(spark, "/root/testdata/sf0.001").schema)
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("the decimal lint catches top-level and nested decimal columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dec = Seq(1.5).toDF("v").select(col("v").cast("decimal(12,2)").as("d"))
    assert(Verify.lintDecimalOutput("fx", dec.schema).exists(_.contains("d")))
    val nested = dec.select(struct(col("d")).as("s"), array(col("d")).as("a"))
    assert(Verify.lintDecimalOutput("fx", nested.schema).isDefined)
    val clean = Seq((1L, 2.0)).toDF("a", "b")
    assert(Verify.lintDecimalOutput("fx", clean.schema).isEmpty)
  }
}
