package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (SURVEY.md §2.7) — the engine's
  * equivalent of the reference's Great Expectations suites
  * (reference: dags/validation_utils.py) and dbt schema/singular tests.
  *
  * Where GX issues one SQL query per expectation, this compiler fuses every
  * aggregate-able constraint of a suite into ONE `df.agg(...)` pass (single
  * scan, single job — the 100 TB-friendly shape); only referential-
  * integrity checks need their own anti-join. `mostly = p` means "fraction
  * of passing rows ≥ p"; Between/InSet exclude NULLs from the denominator
  * (GX semantics, SURVEY.md §7.4 item 6), NotNull does not.
  */
sealed trait Constraint { def name: String }
case class ColumnExists(column: String) extends Constraint { val name = s"column_exists($column)" }
case class RowCountBetween(min: Long, max: Long = Long.MaxValue) extends Constraint { val name = s"row_count_between($min,$max)" }
case class NotNull(column: String, mostly: Double = 1.0) extends Constraint { val name = s"not_null($column)" }
case class Between(column: String, lo: Double, hi: Double, mostly: Double = 1.0) extends Constraint { val name = s"between($column,$lo,$hi)" }
case class InSet(column: String, values: Seq[Any], mostly: Double = 1.0) extends Constraint { val name = s"in_set($column)" }
case class Unique(columns: Seq[String]) extends Constraint { val name = s"unique(${columns.mkString(",")})" }
/** GX `expect_column_pair_values_A_to_be_greater_than_B`: rows where
  * `colA > colB` (or `>=` with `orEqual`). Rows where EITHER side is
  * NULL are exempt and leave the denominator (GX's default
  * `ignore_row_if = "either_value_is_missing"`). */
case class PairGreater(colA: String, colB: String, orEqual: Boolean = false,
                       mostly: Double = 1.0) extends Constraint {
  val name = s"pair_greater($colA,$colB${if (orEqual) ",or_equal" else ""})"
}
case class AcceptedValues(column: String, values: Seq[Any]) extends Constraint { val name = s"accepted_values($column)" }
case class References(column: String, parent: DataFrame, parentColumn: String) extends Constraint { val name = s"references($column)" }
/** dbt singular test: rows satisfying `predicate` must not exist
  * (reference: tests/assert_total_amount_positive.sql). */
case class NoRowsWhere(label: String, predicate: Column) extends Constraint { val name = s"no_rows_where($label)" }

case class CheckResult(constraint: String, column: Option[String],
                       passed: Boolean, unexpectedPercent: Double)

/** Per-run quality telemetry — the engine analog of GX writing a
  * validation result per expectation per run (validation_utils.py:69-84;
  * the reference keeps only runtime_seconds in its metadata table, so
  * this is a strict superset): one row per constraint per gate, appended
  * to a single-partition parquet ledger keyed by (run_id, layer).
  *
  * Concurrency contract: the default (`concurrent = false`) is SINGLE
  * WRITER. `record` is a plain parquet append — sequential multi-run
  * appends are safe and spec-proven, but two pipelines appending the
  * SAME flat ledger concurrently are only kept apart by part-file UUID
  * luck (parquet directories have no commit protocol). The reference's
  * orchestrator runs validation tasks strictly sequentially, so the flat
  * shape is the semantics being matched, not a shortcut.
  *
  * `concurrent = true` removes the external-serialization requirement:
  * each run appends under its OWN subdirectory (`path/run_id=<id>/` —
  * writers with distinct run ids never touch the same directory, so
  * parallel orchestrators need no coordination), and `read()` unions the
  * per-run subdirectories — metadata-scale, a few files per run. Run ids
  * are restricted to filesystem-safe characters in this mode. */
class CheckLedger(spark: org.apache.spark.sql.SparkSession, path: String,
                  concurrent: Boolean = false) {

  def record(runId: String, layer: String, results: Seq[CheckResult]): Unit = {
    import spark.implicits._
    if (results.isEmpty) return
    if (concurrent) require(runId.matches("[A-Za-z0-9._-]+"),
      s"concurrent ledger run ids must be [A-Za-z0-9._-]+, got '$runId'")
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val target = if (concurrent) s"$path/run_id=$runId" else path
    results.map(r => (runId, layer, r.constraint, r.column.orNull,
        r.passed, r.unexpectedPercent, now))
      .toDF("run_id", "layer", "constraint", "column", "passed",
        "unexpected_percent", "checked_at")
      .coalesce(1)
      .write.mode("append").parquet(target)
  }

  /** Run-over-run regression report — the question the per-run gate
    * cannot answer: "did quality DRIFT since last run?" Per (layer,
    * constraint), the latest two runs' unexpected percentages side by
    * side with the delta and a `newly_failing` flag (passed before,
    * fails now — the page-the-owner condition; a constraint whose
    * percentage creeps while still under `mostly` shows in
    * `delta_pct` long before the gate trips).
    *
    * Run ORDER is the lexicographic run_id order — the caller issues
    * monotone ids (date-stamped ids sort correctly); `checked_at`
    * wall-clock never orders anything (nondeterministic). One row per
    * (run, layer, constraint) is the [[record]] contract this relies
    * on. Constraints seen in only one run report NULL prev columns.
    * Shape: one window pass + one aggregate over the ledger
    * (runs × constraints — metadata-scale). */
  def regressions(): Option[org.apache.spark.sql.DataFrame] =
    read().map(CheckLedger.regressionsOf)

  def read(): Option[org.apache.spark.sql.DataFrame] =
    if (!concurrent) graft.sources.Tables.readParquetIfExists(spark, path)
    else {
      // union-at-read over the per-run subdirectories; each subdir
      // carries the full schema (run_id lives in the DATA, the dir name
      // is only an isolation key), so no partition-inference is involved
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val runs = fs.listStatus(p).filter(s =>
          s.isDirectory && s.getPath.getName.startsWith("run_id="))
        if (runs.isEmpty) None
        else Some(runs.map(s => spark.read.parquet(s.getPath.toString))
          .reduce(_ unionByName _))
      }
    }
}

object CheckLedger {
  /** The pure computation behind [[CheckLedger.regressions]] — public
    * so externally-assembled ledgers (unions across pipelines) get
    * the same report. */
  def regressionsOf(ledger: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("layer"), col("constraint"))
      .orderBy(col("run_id").desc)
    ledger
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col("layer"), col("constraint"))
      .agg(
        max(when(col("__rn") === 2, col("run_id"))).as("prev_run"),
        max(when(col("__rn") === 1, col("run_id"))).as("last_run"),
        max(when(col("__rn") === 2, col("unexpected_percent")))
          .as("prev_pct"),
        max(when(col("__rn") === 1, col("unexpected_percent")))
          .as("last_pct"),
        max(when(col("__rn") === 2, col("passed"))).as("prev_passed"),
        max(when(col("__rn") === 1, col("passed"))).as("last_passed"))
      .withColumn("delta_pct", col("last_pct") - col("prev_pct"))
      .withColumn("newly_failing",
        coalesce(col("prev_passed"), lit(false)) && !col("last_passed"))
  }
}

/** Thrown when a suite fails — the engine analog of the reference's
  * `raise ValueError(failures)` gate (validation_utils.py:72-84). */
case class QualityGateException(failures: Seq[CheckResult])
  extends RuntimeException(
    "quality gate failed: " + failures.map(f =>
      s"${f.constraint} unexpected=${f.unexpectedPercent}%").mkString("; "))

class CheckSuite(constraints: Seq[Constraint]) {

  /** Run all constraints; aggregate-able ones fuse into one pass. */
  def run(df: DataFrame): Seq[CheckResult] = {
    val total = "__total"
    // (constraint, unexpected-count expr, denominator expr)
    val fused: Seq[(Constraint, Column, Column)] = constraints.collect {
      case c @ NotNull(cn, _) =>
        (c, count(when(col(cn).isNull, 1)), count(lit(1)))
      case c @ Between(cn, lo, hi, _) =>
        (c, count(when(col(cn).isNotNull && !(col(cn) >= lo && col(cn) <= hi), 1)), count(col(cn)))
      case c @ InSet(cn, vs, _) =>
        (c, count(when(col(cn).isNotNull && !col(cn).isin(vs: _*), 1)), count(col(cn)))
      case c @ AcceptedValues(cn, vs) =>
        (c, count(when(col(cn).isNotNull && !col(cn).isin(vs: _*), 1)), count(col(cn)))
      case c @ Unique(cols) =>
        // dbt `unique` semantics: NULL keys are exempt (the dbt test body
        // filters `WHERE col IS NOT NULL`; SQL COUNT(DISTINCT a, b) already
        // drops any-NULL tuples). Multi-column contract: a row whose key
        // tuple contains ANY NULL component is excluded from BOTH terms —
        // the countDistinct convention — so two (1, NULL) rows do not fail.
        val keyed = cols.map(col(_).isNotNull).reduce(_ && _)
        (c, count(when(keyed, 1)) - countDistinct(cols.head, cols.tail: _*),
          count(when(keyed, 1)))
      case c @ PairGreater(a, b, orEq, _) =>
        val both = col(a).isNotNull && col(b).isNotNull
        val ok = if (orEq) col(a) >= col(b) else col(a) > col(b)
        (c, count(when(both && !ok, 1)), count(when(both, 1)))
      case c @ NoRowsWhere(_, p) =>
        (c, count(when(p, 1)), count(lit(1)))
      case c @ RowCountBetween(_, _) =>
        (c, count(lit(1)), count(lit(1))) // repurposed: unexpected expr carries the row count
    }

    val aggExprs = fused.zipWithIndex.flatMap { case ((_, bad, denom), i) =>
      Seq(bad.as(s"__bad_$i"), denom.as(s"__den_$i"))
    } :+ count(lit(1)).as(total)
    val row = if (aggExprs.nonEmpty) df.agg(aggExprs.head, aggExprs.tail: _*).first() else null

    val fusedResults = fused.zipWithIndex.map { case ((c, _, _), i) =>
      val bad = row.getLong(row.fieldIndex(s"__bad_$i"))
      val den = row.getLong(row.fieldIndex(s"__den_$i"))
      c match {
        case RowCountBetween(mn, mx) =>
          val n = row.getLong(row.fieldIndex(total))
          CheckResult(c.name, None, n >= mn && n <= mx, 0.0)
        case _ =>
          val pct = if (den == 0) 0.0 else bad.toDouble / den * 100.0
          val mostly = c match {
            case NotNull(_, m) => m; case Between(_, _, _, m) => m
            case InSet(_, _, m) => m; case PairGreater(_, _, _, m) => m
            case _ => 1.0
          }
          val columnOf = c match {
            case NotNull(cn, _) => Some(cn); case Between(cn, _, _, _) => Some(cn)
            case InSet(cn, _, _) => Some(cn); case AcceptedValues(cn, _) => Some(cn)
            case Unique(cs) => Some(cs.mkString(","))
            case PairGreater(a, b, _, _) => Some(s"$a,$b")
            case _ => None
          }
          CheckResult(c.name, columnOf, (den - bad).toDouble >= mostly * den - 1e-9, pct)
      }
    }

    val schemaResults = constraints.collect { case ColumnExists(cn) =>
      val exists = df.columns.exists(_.equalsIgnoreCase(cn)) // case-insensitive, §1.2
      CheckResult(s"column_exists($cn)", Some(cn), exists, if (exists) 0.0 else 100.0)
    }

    val riResults = constraints.collect { case References(cn, parent, pc) =>
      val orphans = df.select(col(cn)).filter(col(cn).isNotNull).distinct()
        .join(parent.select(col(pc).as(cn)).distinct(), Seq(cn), "left_anti")
        .count()
      CheckResult(s"references($cn)", Some(cn), orphans == 0, if (orphans == 0) 0.0 else 100.0)
    }

    schemaResults ++ fusedResults ++ riResults
  }

  /** Run and throw [[QualityGateException]] on any failure (Q11). */
  def gate(df: DataFrame): Seq[CheckResult] = {
    val results = run(df)
    val failures = results.filterNot(_.passed)
    if (failures.nonEmpty) throw QualityGateException(failures)
    results
  }
}

/** Declarative suite CONFIG — constraints as data, the way the
  * reference expresses them (GX suites / dbt schema.yml are YAML the
  * operators never see at compile time): a JSON array of descriptors
  * parses into a [[CheckSuite]], so suites ship as config files,
  * diff in code review, and generate programmatically. Parsing runs
  * through Spark's own JSON reader (no extra dependency, schema
  * pinned), values arrive as strings and compare under Spark's usual
  * implicit casts, and singular-test predicates are SQL strings
  * compiled with `expr(...)`.
  *
  * Descriptor shapes (unknown `type` throws, listing the offender):
  * {{{
  * [{"type":"not_null","column":"l_orderkey"},
  *  {"type":"between","column":"l_quantity","lo":1,"hi":50,"mostly":0.99},
  *  {"type":"in_set","column":"flag","values":["A","N"],"mostly":1.0},
  *  {"type":"unique","columns":["k1","k2"]},
  *  {"type":"accepted_values","column":"c","values":["1","2"]},
  *  {"type":"column_exists","column":"c"},
  *  {"type":"row_count_between","min":1,"max":100},
  *  {"type":"references","column":"fk","parent":"dim","parent_column":"pk"},
  *  {"type":"no_rows_where","label":"neg","predicate":"amount < 0"}]
  * }}}
  * `references.parent` resolves through the caller's `tables` map —
  * config stays engine-agnostic table NAMES, binding happens here.
  *
  * TRUST MODEL: `no_rows_where` predicates (and column names) compile
  * verbatim through `expr(...)`, so a check catalog is EXECUTABLE SQL
  * with the caller's privileges — review it as code, never accept it
  * from an untrusted channel (same contract as
  * `graft.operators.Metrics`). */
object CheckConfig {
  def fromJson(spark: org.apache.spark.sql.SparkSession, json: String,
               tables: Map[String, DataFrame] = Map.empty): CheckSuite = {
    import spark.implicits._
    val schema = "type STRING, column STRING, columns ARRAY<STRING>, " +
      "values ARRAY<STRING>, lo DOUBLE, hi DOUBLE, mostly DOUBLE, " +
      "min BIGINT, max BIGINT, parent STRING, parent_column STRING, " +
      "label STRING, predicate STRING, column_a STRING, " +
      "column_b STRING, or_equal BOOLEAN"
    val rows = spark.read.schema(schema).json(Seq(json).toDS).collect()
    val constraints: Seq[Constraint] = rows.toIndexedSeq.map { r =>
      def opt(f: String): Option[String] = Option(r.getAs[String](f))
      def req(f: String): String = opt(f).getOrElse(throw new
          IllegalArgumentException(s"constraint '${opt("type").getOrElse("?")}' missing '$f'"))
      def num(f: String, dflt: Double): Double =
        if (r.isNullAt(r.fieldIndex(f))) dflt else r.getDouble(r.fieldIndex(f))
      def lng(f: String, dflt: Long): Long =
        if (r.isNullAt(r.fieldIndex(f))) dflt else r.getLong(r.fieldIndex(f))
      def strs(f: String): Seq[String] = {
        val i = r.fieldIndex(f)
        require(!r.isNullAt(i), s"constraint '${req("type")}' missing '$f'")
        r.getSeq[String](i)
      }
      req("type") match {
        case "column_exists" => ColumnExists(req("column"))
        case "row_count_between" =>
          RowCountBetween(lng("min", 0L), lng("max", Long.MaxValue))
        case "not_null" => NotNull(req("column"), num("mostly", 1.0))
        case "between" =>
          require(!r.isNullAt(r.fieldIndex("lo")) && !r.isNullAt(r.fieldIndex("hi")),
            "'between' needs lo and hi")
          Between(req("column"), num("lo", 0), num("hi", 0), num("mostly", 1.0))
        case "in_set" => InSet(req("column"), strs("values"), num("mostly", 1.0))
        case "unique" => Unique(strs("columns"))
        case "accepted_values" => AcceptedValues(req("column"), strs("values"))
        case "references" =>
          val p = req("parent")
          References(req("column"),
            tables.getOrElse(p, throw new IllegalArgumentException(
              s"references parent table '$p' not in the provided tables map")),
            req("parent_column"))
        case "no_rows_where" => NoRowsWhere(req("label"), expr(req("predicate")))
        case "pair_greater" =>
          val orEq = r.schema.fieldNames.contains("or_equal") &&
            !r.isNullAt(r.fieldIndex("or_equal")) &&
            r.getBoolean(r.fieldIndex("or_equal"))
          PairGreater(req("column_a"), req("column_b"), orEq,
            num("mostly", 1.0))
        case other =>
          throw new IllegalArgumentException(s"unknown constraint type '$other'")
      }
    }
    new CheckSuite(constraints)
  }
}

/** Structural (schema-level) data contract — the zero-scan complement
  * of the row-level CheckSuite: missing columns, unexpected extras, and
  * type drift are caught from METADATA before any job runs, the way the
  * reference's ColumnExists battery gates a layer before validating its
  * rows. Expected types are Spark DDL strings ("bigint", "string",
  * "decimal(38,6)", "array<float>"); names compare case-insensitively
  * (ingest lowercases, S2). */
case class SchemaDiff(missing: Seq[(String, String)],
                      extra: Seq[(String, String)],
                      typeMismatch: Seq[(String, String, String)]) {
  def isClean: Boolean = missing.isEmpty && extra.isEmpty && typeMismatch.isEmpty
  def describe: String = (
    missing.map { case (c, t) => s"missing $c: $t" } ++
      extra.map { case (c, t) => s"unexpected $c: $t" } ++
      typeMismatch.map { case (c, e, a) => s"$c: expected $e, got $a" })
    .mkString("; ")
}

object SchemaContract {

  import org.apache.spark.sql.types._

  /** Strip nullability (and field metadata) at every nesting level
    * before comparing: `DataType` equality is structural, so an
    * `array<int>` whose elements happen to be provably non-null
    * (`containsNull = false`) would otherwise report as TYPE DRIFT
    * against the DDL default `array<int>` (containsNull = true) — with
    * a message rendering two identical `simpleString`s. Nullability is
    * an optimizer fact, not a contract violation; the contract compares
    * the logical type shape only. */
  private def normalize(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(normalize(et), containsNull = true)
    case MapType(k, v, _) =>
      MapType(normalize(k), normalize(v), valueContainsNull = true)
    case StructType(fields) => StructType(fields.map(f =>
      StructField(f.name, normalize(f.dataType), nullable = true)))
    case other => other
  }

  def diff(df: DataFrame, expected: Seq[(String, String)]): SchemaDiff = {
    val actual = df.schema.fields
      .map(f => f.name.toLowerCase -> normalize(f.dataType)).toMap
    val exp = expected.map { case (n, t) =>
      n.toLowerCase -> normalize(DataType.fromDDL(t))
    }
    val missing = exp.collect { case (n, t) if !actual.contains(n) =>
      n -> t.simpleString }
    val extra = actual.toSeq.collect {
      case (n, t) if !exp.exists(_._1 == n) => n -> t.simpleString
    }.sortBy(_._1)
    val mismatch = exp.collect {
      case (n, t) if actual.contains(n) && actual(n) != t =>
        (n, t.simpleString, actual(n).simpleString)
    }
    SchemaDiff(missing, extra, mismatch)
  }

  /** Gate form: throws [[QualityGateException]] (one synthetic failed
    * CheckResult per problem) when the contract is violated;
    * `allowExtra` tolerates additive evolution (new columns) while
    * still failing on loss or drift. */
  def validate(df: DataFrame, expected: Seq[(String, String)],
               allowExtra: Boolean = false): Unit = {
    val d = diff(df, expected)
    val failures =
      d.missing.map { case (c, t) =>
        CheckResult(s"schema_missing($c: $t)", Some(c), passed = false, 100.0) } ++
        (if (allowExtra) Nil else d.extra.map { case (c, t) =>
          CheckResult(s"schema_extra($c: $t)", Some(c), passed = false, 100.0) }) ++
        d.typeMismatch.map { case (c, e, a) =>
          CheckResult(s"schema_type($c: $e != $a)", Some(c), passed = false, 100.0) }
    if (failures.nonEmpty) throw QualityGateException(failures)
  }
}

object CheckSuite {
  def apply(constraints: Constraint*): CheckSuite = new CheckSuite(constraints)

  /** Zero-extra-scan pipeline telemetry via Spark's `Observation` API:
    * attach row/null counters to a frame and they are computed INSIDE
    * whatever action the caller was going to run anyway — unlike a
    * CheckSuite run, which is its own aggregate job over the data. The
    * "free metrics alongside the write" half of validation: gate on the
    * observed values after the action (`obs.get`), reserve the full
    * suite for gates that must block BEFORE downstream work reads the
    * output.
    *
    * At 100 TB the difference is one full scan: suites re-aggregate,
    * observations piggyback. Metrics: `n_rows` plus `n_null_<col>` per
    * requested column. */
  def observeRowStats(df: org.apache.spark.sql.DataFrame,
                      obs: org.apache.spark.sql.Observation,
                      nullCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val metrics = count(lit(1)).as("n_rows") +:
      nullCols.map(c =>
        sum(col(c).isNull.cast("long")).as(s"n_null_$c"))
    df.observe(obs, metrics.head, metrics.tail: _*)
  }

  /** The reference's three layer suites, verbatim thresholds
    * (validation_utils.py:93-127; models/(bronze|silver|gold)/schema.yml). */
  def bronzeSuite(): CheckSuite = new CheckSuite(
    graft.model.Schemas.trip.fieldNames.filterNot(_ == "airport_fee").map(ColumnExists(_)).toSeq ++
      Seq(RowCountBetween(1), NotNull("tpep_pickup_datetime", 0.99),
        NotNull("vendorid"), NotNull("tpep_dropoff_datetime")))

  def silverSuite(bronze: DataFrame): CheckSuite = new CheckSuite(Seq(
    NotNull("vendorid"), NotNull("tpep_pickup_datetime"),
    Between("total_amount", 0, Double.MaxValue, 0.99),
    Between("trip_distance", 0, Double.MaxValue, 0.99),
    InSet("payment_type", Seq(1, 2, 3, 4, 5, 6), 0.99),
    Unique(Seq("unique_trip_id")), NotNull("unique_trip_id"),
    AcceptedValues("payment_type", Seq(0, 1, 2, 3, 4, 5, 6)),
    References("vendorid", bronze, "vendorid"),
    NoRowsWhere("total_amount_positive", col("total_amount") < 0)))

  def goldMonthlySuite(): CheckSuite = new CheckSuite(Seq(
    NotNull("revenue_month"),
    Between("total_monthly_revenue", 0, 1e9),
    Between("total_monthly_trips", 1, 1e7)))
}

/** Data-freshness monitor: per group (source, feed, partition key),
  * how stale is the newest row relative to an `asOf` reference instant
  * — the first thing an on-call checks when a dashboard flatlines.
  * The reference's orchestrator infers freshness from task success;
  * this measures it from the DATA, which catches the
  * succeeding-but-empty-load failure mode tasks cannot.
  *
  * One hash aggregate (map-side combined max/count); lag is exact
  * integer microseconds against the caller-pinned `asOf` (never
  * wall-clock-now inside the operator — determinism and replays). */
object Freshness {
  def report(df: DataFrame, groupCol: String, tsCol: String,
             asOf: String, maxLagSeconds: Long): DataFrame = {
    require(maxLagSeconds > 0, "maxLagSeconds must be positive")
    val asOfUs = unix_micros(lit(asOf).cast("timestamp_ntz").cast("timestamp"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        max(col(tsCol)).as("last_ts"))
      .withColumn("__asof_us", asOfUs)
      .withColumn("lag_seconds",
        expr("(__asof_us - unix_micros(cast(last_ts as timestamp))) div 1000000L"))
      .drop("__asof_us")
      // a group with no timestamp at all (all-NULL ts) has no freshness
      // evidence — that IS the stale case, not an unknown
      .withColumn("is_stale",
        when(col("last_ts").isNull, lit(true))
          .otherwise(col("lag_seconds") > maxLagSeconds))
  }
}

/** Cross-table reconciliation: does a parent table's DECLARED total
  * equal the SUM of its children — the classic ledger/rollup audit
  * (order header vs line items, invoice vs postings, daily rollup vs
  * fact rows). A whole-batch CheckSuite can say a table is internally
  * plausible; only reconciliation catches a loader that dropped half an
  * order's lines while keeping the header.
  *
  * Arithmetic is decimal-exact end-to-end (the exactSum path, kept in
  * decimal rather than finished to double, so the diff is exact and the
  * tolerance compare has no float edge). One child aggregate + one
  * full-outer key join; both sides shuffle once on the key. Status per
  * key: matched / mismatch / missing_children (header without lines) /
  * missing_parent (lines without a header). */
object Reconcile {
  def reconcile(parent: DataFrame, parentKey: String, declared: Column,
                child: DataFrame, childKey: String, childValue: Column,
                tolerance: BigDecimal = BigDecimal(0)): DataFrame = {
    val p = parent.select(col(parentKey).as("key"),
      declared.cast("decimal(20,6)").cast("decimal(38,6)").as("declared_total"))
    val c = child
      .groupBy(col(childKey).as("key"))
      .agg(sum(childValue.cast("decimal(20,6)")).cast("decimal(38,6)")
        .as("computed_total"))
    p.join(c, Seq("key"), "full_outer")
      .withColumn("diff", col("declared_total") - col("computed_total"))
      .withColumn("status",
        when(col("declared_total").isNull, lit("missing_parent"))
          .when(col("computed_total").isNull, lit("missing_children"))
          .when(abs(col("diff")) <= lit(tolerance), lit("matched"))
          .otherwise(lit("mismatch")))
  }

  /** Rollup of [[reconcile]]: row counts and exact total absolute
    * drift per status — the one-look audit summary. */
  def summary(reconciled: DataFrame): DataFrame =
    reconciled.groupBy(col("status"))
      .agg(count(lit(1)).as("n_keys"),
        sum(abs(col("diff"))).cast("decimal(38,6)").as("total_abs_diff"))
}

/** Row-level quarantine routing — the per-ROW complement of the
  * aggregate suites above. Where a [[CheckSuite]] gate answers "is this
  * BATCH acceptable" (and a `mostly` threshold tolerates stragglers),
  * quarantine answers "WHICH rows failed, and why" and routes them to a
  * dead-letter output instead of failing the batch — the standard
  * production pattern for pipelines that must keep flowing while bad
  * rows are triaged (the reference's GX checkpoints can only
  * pass/fail a whole batch; reference: dags/validation_utils.py).
  *
  * Each named check is a row PREDICATE (true = row passes). A row's
  * `quarantine_reasons` is the comma-joined names of every check it
  * fails, in declaration order — one deterministic map-side projection,
  * no shuffle, no second scan: the 100 TB cost is exactly the cost of
  * reading the rows. */
object Quarantine {

  /** Annotate: all input columns + `quarantine_reasons` (NULL for clean
    * rows). */
  def annotate(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one named check required")
    val reasons = concat_ws(",",
      checks.map { case (name, pred) =>
        when(!coalesce(pred, lit(false)), lit(name)) }: _*)
    df.withColumn("quarantine_reasons",
      when(length(reasons) > 0, reasons))
  }

  /** Route: (clean rows, quarantined rows with reasons). Both sides are
    * lazy single-scan projections of the annotated frame. */
  def split(df: DataFrame, checks: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, checks)
    (annotated.filter(col("quarantine_reasons").isNull).drop("quarantine_reasons"),
      annotated.filter(col("quarantine_reasons").isNotNull))
  }

}

/** Dependency-structure checks over a single table. */
object FunctionalDeps {

  /** Functional-dependency check `det → dep` — does every determinant
    * value map to exactly ONE dependent value? The profiling question
    * behind candidate keys, denormalization safety, and "is this
    * column derivable?" (dbt's unique test is the det→rowid special
    * case). NULL dep is a VALUE (repo convention — two rows (x, NULL)
    * and (x, 'a') are a violation); NULL det rows drop (no
    * determinant to check). ONE cells aggregate + one det-scale
    * rollup. Output one row: (n_det_values, n_violating_values,
    * n_violating_rows, holds 0/1). */
  def functionalDependency(df: DataFrame, detCol: String,
                           depCol: String): DataFrame = {
    val perDet = df.filter(col(detCol).isNotNull)
      .groupBy(col(detCol), col(depCol).cast("string").as("__dep"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(detCol))
      .agg(count(lit(1)).as("__nvals"), sum(col("__n")).as("__nrows"))
    perDet.agg(
      count(lit(1)).cast("long").as("n_det_values"),
      sum(when(col("__nvals") > 1, 1L).otherwise(0L)).cast("long")
        .as("n_violating_values"),
      sum(when(col("__nvals") > 1, col("__nrows")).otherwise(0L))
        .cast("long").as("n_violating_rows"))
      .withColumn("holds",
        when(col("n_violating_values") === 0L, 1L).otherwise(0L))
  }
}
