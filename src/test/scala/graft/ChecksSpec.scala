package graft

import org.apache.spark.sql.functions._
import graft.checks._

/** `mostly` semantics per GX (SURVEY.md §2.7, §7.4 item 6): Between/InSet
  * exclude NULLs from the denominator; NotNull does not. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq[(Option[Int], Option[Double])](
    (Some(1), Some(10.0)), (Some(2), Some(20.0)), (Some(3), Some(-5.0)),
    (Some(1), None), (None, Some(30.0))
  ).toDF("pay", "amount")

  private def result(s: Seq[CheckResult], name: String): CheckResult =
    s.find(_.constraint.startsWith(name)).get

  test("NotNull counts NULLs over ALL rows") {
    val r = result(new CheckSuite(Seq(NotNull("pay", 0.8))).run(df), "not_null")
    assert(r.passed)                         // 4/5 = 0.8 ≥ 0.8
    assert(math.abs(r.unexpectedPercent - 20.0) < 1e-9)
    assert(!result(new CheckSuite(Seq(NotNull("pay", 0.9))).run(df), "not_null").passed)
  }

  test("Between excludes NULLs from the denominator") {
    val r = result(new CheckSuite(Seq(Between("amount", 0, 100, 0.75))).run(df), "between")
    assert(r.passed)                         // 3 of 4 non-null in range
    assert(math.abs(r.unexpectedPercent - 25.0) < 1e-9)
  }

  test("InSet ignores NULLs; AcceptedValues is the strict dbt variant") {
    val r = result(new CheckSuite(Seq(InSet("pay", Seq(1, 2), 0.75))).run(df), "in_set")
    assert(r.passed)                         // 3 of 4 non-null in {1,2}
    val r2 = result(new CheckSuite(Seq(AcceptedValues("pay", Seq(1, 2)))).run(df), "accepted")
    assert(!r2.passed)                       // value 3 violates strictly
  }

  test("Unique detects duplicate keys") {
    val r = result(new CheckSuite(Seq(Unique(Seq("pay")))).run(df), "unique")
    assert(!r.passed)                        // pay=1 appears twice
    val ok = Seq(1, 2, 3).toDF("k")
    assert(result(new CheckSuite(Seq(Unique(Seq("k")))).run(ok), "unique").passed)
  }

  test("References is an anti-join on distinct child keys") {
    val parent = Seq(1, 2).toDF("id")
    val r = result(new CheckSuite(Seq(References("pay", parent, "id"))).run(df), "references")
    assert(!r.passed)                        // pay=3 is an orphan
    val parent2 = Seq(1, 2, 3).toDF("id")
    assert(result(new CheckSuite(Seq(References("pay", parent2, "id"))).run(df), "references").passed)
  }

  test("ColumnExists is case-insensitive; RowCountBetween gates emptiness") {
    val s = new CheckSuite(Seq(ColumnExists("PAY"), ColumnExists("missing"), RowCountBetween(1))).run(df)
    assert(result(s, "column_exists(PAY)").passed)
    assert(!result(s, "column_exists(missing)").passed)
    assert(result(s, "row_count").passed)
  }

  test("gate throws QualityGateException carrying the failures") {
    val e = intercept[QualityGateException] {
      new CheckSuite(Seq(NotNull("pay"), NoRowsWhere("neg", col("amount") < 0))).gate(df)
    }
    assert(e.failures.size == 2)
    new CheckSuite(Seq(RowCountBetween(1))).gate(df) // passes, no throw
  }

  test("SchemaContract catches loss, drift, and extras from metadata only") {
    val df = Seq((1L, "a", 0.5)).toDF("id", "name", "score")
    val good = Seq("id" -> "bigint", "name" -> "string", "score" -> "double")
    assert(SchemaContract.diff(df, good).isClean)
    SchemaContract.validate(df, good) // no throw
    val bad = Seq("id" -> "int", "missing_col" -> "string", "name" -> "string")
    val d = SchemaContract.diff(df, bad)
    assert(d.missing == Seq("missing_col" -> "string"))
    assert(d.extra == Seq("score" -> "double"))
    assert(d.typeMismatch == Seq(("id", "int", "bigint")))
    val e = intercept[QualityGateException] { SchemaContract.validate(df, bad) }
    assert(e.failures.size == 3)
    // additive evolution tolerated with allowExtra
    val subset = Seq("id" -> "bigint", "name" -> "string")
    SchemaContract.validate(df, subset, allowExtra = true)
    intercept[QualityGateException] { SchemaContract.validate(df, subset) }
  }

  test("SchemaContract names compare case-insensitively (lowercase ingest)") {
    val df = Seq((1L, 2.0)).toDF("ID", "Val")
    assert(SchemaContract.diff(df,
      Seq("id" -> "bigint", "val" -> "double")).isClean)
  }

  test("SchemaContract ignores nested nullability (optimizer fact, not drift)") {
    import org.apache.spark.sql.types._
    // array elements provably non-null (containsNull = false) and a
    // required struct field: both must compare CLEAN against the DDL
    // forms, whose nested types default to nullable — before the
    // normalization fix this reported type drift with two identical
    // simpleStrings in the message.
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(IntegerType, containsNull = false)),
      StructField("meta", StructType(Seq(
        StructField("k", StringType, nullable = false),
        StructField("v", MapType(StringType, LongType,
          valueContainsNull = false)))))))
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val expected = Seq("id" -> "bigint", "tags" -> "array<int>",
      "meta" -> "struct<k:string,v:map<string,bigint>>")
    assert(SchemaContract.diff(df, expected).isClean)
    // a REAL nested type change still reports
    val drift = SchemaContract.diff(df, Seq("id" -> "bigint",
      "tags" -> "array<string>",
      "meta" -> "struct<k:string,v:map<string,bigint>>"))
    assert(drift.typeMismatch ==
      Seq(("tags", "array<string>", "array<int>")))
  }

  test("CheckLedger concurrent mode: parallel appends, union-at-read") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ledger-conc").toString + "/ledger"
    val ledger = new CheckLedger(spark, path, concurrent = true)
    val res = Seq(CheckResult("not_null(x)", Some("x"), passed = true, 0.0))
    // genuinely concurrent appends with distinct run ids — each lands in
    // its own run_id= subdirectory, no commit-protocol collision possible
    val threads = (1 to 4).map { i =>
      new Thread(() => ledger.record(s"run-$i", "silver", res))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val out = ledger.read().get
    assert(out.count() == 4)
    assert(out.select("run_id").distinct().count() == 4)
    assert(out.columns.toSeq == Seq("run_id", "layer", "constraint",
      "column", "passed", "unexpected_percent", "checked_at"))
    // same-run sequential append still accumulates
    ledger.record("run-1", "gold", res)
    assert(ledger.read().get.count() == 5)
    // unsafe run id refused up front
    intercept[IllegalArgumentException] {
      ledger.record("run/../escape", "silver", res)
    }
    // empty/absent ledger reads as None
    assert(new CheckLedger(spark, path + "-absent", concurrent = true)
      .read().isEmpty)
  }

  test("observeRowStats piggybacks row/null metrics on the caller's action") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "pay")
    val obs = org.apache.spark.sql.Observation("rowstats")
    val observed = CheckSuite.observeRowStats(df, obs, Seq("pay"))
    observed.write.format("noop").mode("overwrite").save() // the caller's own action
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("n_null_pay") == 1L)
  }
}
