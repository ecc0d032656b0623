package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule: calendar-bucket EQUALITY on a DATE column
  * rewrites to the equivalent half-open date RANGE —
  *
  *   `year(d) = y`            → `d >= y-01-01 AND d < (y+1)-01-01`
  *   `trunc(d, 'month') = m`  → `d >= m AND d < m + 1 month`
  *   `trunc(d, 'year') = y`   → `d >= y AND d < y + 1 year`
  *
  * The left sides are FUNCTIONS of the column, so the data source
  * can't push them (the scan reads every row group); the ranges are
  * plain comparisons on the attribute and reach `PushedFilters`,
  * pruning row groups and partitions. This is the reference's
  * month-equality ingest predicate (SURVEY P4 — bronze loads filter
  * `to_char(pickup, 'YYYY-MM') = month`) made sargable, as the second
  * `Rule[LogicalPlan]` on the (c)-tier surface beside
  * [[AbsRangeRewrite]] (same registration paths).
  *
  * Equivalence:
  *  - NULL d: both sides NULL (And of two NULL comparisons) — same.
  *  - trunc literals NOT on a bucket boundary (e.g. trunc(d,'month') =
  *    1996-03-15) can never equal a truncation — rewritten to a
  *    null-preserving FALSE (`d IS NULL AND NULL`? no — simply left
  *    unrewritten: correctness either way, and the shape is a caller
  *    bug better surfaced by reading the plan than silently folded).
  *  - The match requires a DateType child. `year(timestamp)` still
  *    rewrites — the analyzer has already wrapped it as
  *    `Year(Cast(ts AS DATE))`, and the range lands on that SAME cast
  *    expression, so the session-zone conversion stays inside the
  *    cast and semantics are exact (whether the cast then unwraps
  *    into a pushable timestamp range is Spark's
  *    UnwrapCastInBinaryComparison's business, not ours).
  *  - Only deterministic children rewrite (duplication rule).
  * Literals fold HERE (the [[AbsRangeRewrite]] lesson:
  * extraOptimizations run after ConstantFolding, and only plain
  * Literals translate into PushedFilters). */
object DateTruncRangeRewrite extends Rule[LogicalPlan] {

  private def dateLit(epochDay: Long): Literal =
    Literal.create(epochDay.toInt, DateType)

  private def yearRange(x: Expression, y: Int): Option[Expression] =
    if (y < 1 || y > 9998) None
    else {
      val lo = java.time.LocalDate.of(y, 1, 1).toEpochDay
      val hi = java.time.LocalDate.of(y + 1, 1, 1).toEpochDay
      Some(And(GreaterThanOrEqual(x, dateLit(lo)),
        LessThan(x, dateLit(hi))))
    }

  /** Half-open range for `trunc(d, fmt) = v` — only when `v` sits ON
    * the bucket boundary. */
  private def truncRange(x: Expression, fmt: String,
                         v: Int): Option[Expression] = {
    val d = java.time.LocalDate.ofEpochDay(v.toLong)
    val months = fmt.toLowerCase match {
      case "month" | "mon" | "mm" => Some(1L)
      case "year" | "yyyy" | "yy" => Some(12L)
      case _ => None // week/quarter: out of scope, leave unrewritten
    }
    months.flatMap { m =>
      val aligned =
        d.getDayOfMonth == 1 && (m == 1L || d.getMonthValue == 1)
      if (!aligned) None
      else Some(And(GreaterThanOrEqual(x, dateLit(d.toEpochDay)),
        LessThan(x, dateLit(d.plusMonths(m).toEpochDay))))
    }
  }

  private object YearOfDate {
    def unapply(e: Expression): Option[Expression] = e match {
      case Year(x) if x.dataType == DateType && x.deterministic =>
        Some(x)
      case _ => None
    }
  }

  private object TruncOfDate {
    def unapply(e: Expression): Option[(Expression, String)] = e match {
      case TruncDate(x, Literal(f: UTF8String, StringType))
          if x.dataType == DateType && x.deterministic && f != null =>
        Some((x, f.toString))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case eq @ EqualTo(YearOfDate(x), Literal(y: Integer, IntegerType)) =>
        yearRange(x, y).getOrElse(eq)
      case eq @ EqualTo(Literal(y: Integer, IntegerType), YearOfDate(x)) =>
        yearRange(x, y).getOrElse(eq)
      case eq @ EqualTo(TruncOfDate(x, fmt),
          Literal(v: Integer, DateType)) =>
        truncRange(x, fmt, v).getOrElse(eq)
      case eq @ EqualTo(Literal(v: Integer, DateType),
          TruncOfDate(x, fmt)) =>
        truncRange(x, fmt, v).getOrElse(eq)
    }

  /** Ad-hoc registration on a live session; idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
