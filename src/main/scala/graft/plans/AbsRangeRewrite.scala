package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: `abs(x) <= c` (and `<`) with a
  * non-negative literal bound rewrites to the conjunctive range
  * `x >= -c AND x <= c` — semantically identical (see below) but,
  * unlike the `Abs` form, PUSHABLE: parquet data-source filters only
  * accept plain comparisons on attributes, so the original predicate
  * scans every row group while the rewrite reaches `PushedFilters`
  * and prunes row groups via the min/max stats (Round11OpsSpec pins
  * the plan difference; q439 runs it against a value-sorted lake).
  * This is the engine's demonstration of the (c)-tier extension
  * surface — a `Rule[LogicalPlan]` injected via
  * [[graft.functions.GraftExtensions]] — used where built-in
  * operators genuinely cannot express the win (no DataFrame API
  * spelling of `abs(x) <= c` is pushable).
  *
  * Equivalence argument (exactly why the guard exists):
  *  - NULL x: both sides yield NULL — same.
  *  - NaN x (float/double): `abs(NaN) <= c` is false; the conjunct's
  *    `NaN >= -c` is false — same.
  *  - `-0.0`: `abs(-0.0) = 0.0 <= c` iff `-0.0 >= -c && -0.0 <= c`
  *    (IEEE comparisons treat -0.0 = 0.0) — same.
  *  - The literal is required NON-NEGATIVE: a negative bound is
  *    degenerate (always false) and, for integral types, negating
  *    `Long.MinValue` would overflow under ANSI — those rare shapes
  *    stay unrewritten rather than risk a fold-time throw.
  *  - DATA-side integral overflow — `x = Int.MinValue`/`Long.MinValue`
  *    — is the ONE documented divergence, and it is intentional: the
  *    rewrite implements MATHEMATICAL abs (|MinValue| = 2^63 > any
  *    representable c, row excluded, no error), where Spark's `Abs`
  *    under ANSI (the Spark 4 default, and this engine's supported
  *    mode) THROWS ARITHMETIC_OVERFLOW, and under ANSI-off wraps to
  *    MinValue so `abs(x) <= c` wrongly ADMITS the row. The rewrite
  *    is out of contract for ANSI-off wrapped-abs semantics; under
  *    ANSI it turns a runtime throw into the mathematically correct
  *    exclusion (Round12OpsSpec pins both the exclusion and the
  *    unrewritten throw).
  * Only deterministic children rewrite (a nondeterministic x must
  * not be duplicated into two conjuncts). */
object AbsRangeRewrite extends Rule[LogicalPlan] {

  private def nonNegative(l: Literal): Boolean = (l.value, l.dataType) match {
    case (null, _) => false
    case (v: java.lang.Integer, _: IntegerType) => v >= 0
    case (v: java.lang.Long, _: LongType) => v >= 0
    case (v: java.lang.Short, _: ShortType) => v >= 0
    case (v: java.lang.Byte, _: ByteType) => v >= 0
    case (v: java.lang.Double, _: DoubleType) => v >= 0.0
    case (v: java.lang.Float, _: FloatType) => v >= 0.0f
    case (v: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      v.toBigDecimal.signum >= 0
    case _ => false
  }

  /** `-c` folded HERE, not via UnaryMinus: the main optimizer's
    * ConstantFolding batch has already run by the time
    * `extraOptimizations` fire, and DataSourceStrategy only
    * translates plain Literals into PushedFilters — an unfolded
    * UnaryMinus(Literal) keeps the lower bound out of the parquet
    * pushdown (observed live: only the upper bound pushed). */
  private def negate(l: Literal): Literal = (l.value, l.dataType) match {
    case (v: java.lang.Integer, dt) => Literal.create(-v, dt)
    case (v: java.lang.Long, dt) => Literal.create(-v, dt)
    case (v: java.lang.Short, dt) => Literal.create((-v).toShort, dt)
    case (v: java.lang.Byte, dt) => Literal.create((-v).toByte, dt)
    case (v: java.lang.Double, dt) => Literal.create(-v, dt)
    case (v: java.lang.Float, dt) => Literal.create(-v, dt)
    case (v: org.apache.spark.sql.types.Decimal, dt) =>
      Literal.create(v.unary_-, dt)
    case _ => throw new IllegalStateException(
      s"negate: unguarded literal ${l.dataType}") // nonNegative gates
  }

  /** `abs(x) <= c` → `-c <= x <= c`; `abs(x) < c` → `-c < x < c` —
    * the lower bound's strictness MUST match the upper's (an
    * inclusive `x >= -c` under a strict comparison would wrongly
    * admit `x = -c`; the spec's 199-vs-200 fixture pins this). */
  private def range(x: Expression, bound: Literal,
                    strict: Boolean): Expression = {
    val neg = negate(bound)
    val lower = if (strict) GreaterThan(x, neg)
      else GreaterThanOrEqual(x, neg)
    val upper = if (strict) LessThan(x, bound)
      else LessThanOrEqual(x, bound)
    And(lower, upper)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.BINARY_COMPARISON)) {
      case LessThanOrEqual(Abs(x, _), l: Literal)
          if x.deterministic && nonNegative(l) =>
        range(x, l, strict = false)
      case LessThan(Abs(x, _), l: Literal)
          if x.deterministic && nonNegative(l) =>
        range(x, l, strict = true)
      case GreaterThanOrEqual(l: Literal, Abs(x, _))
          if x.deterministic && nonNegative(l) =>
        range(x, l, strict = false)
      case GreaterThan(l: Literal, Abs(x, _))
          if x.deterministic && nonNegative(l) =>
        range(x, l, strict = true)
    }

  /** Ad-hoc registration on a live session (the
    * [[graft.functions.GraftExtensions]] `register` convention);
    * idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
