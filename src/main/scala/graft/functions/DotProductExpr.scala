package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two `array<float>` / `array<double>` columns.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §7.3 preference order —
  * this is tier (b), used only where built-ins genuinely fall short):
  * the built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * higher-order function, which Catalyst evaluates INTERPRETED — measured
  * ~100μs/row at dim 64 on the bench corpus. The unrolled `dotFixed` form
  * is codegen'd but needs the dimension at plan time and emits `dim`
  * bound-checked `element_at` calls. This expression is a single tight
  * loop inside whole-stage codegen, dimension-agnostic.
  *
  * Semantics match the HOF form on well-formed input: accumulation is a
  * sequential left-to-right fold in double precision (bit-identical
  * results); a NULL array yields NULL; a NULL element yields NULL (as
  * aggregate-over-null does). Ragged input (unequal lengths) RAISES —
  * zip_with would null-pad and yield NULL, but a length mismatch in an
  * embedding column is always a data bug, and a silent NULL hides it
  * until it skews a downstream aggregate. Fail fast at the row.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float>/array<double> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private lazy val leftIsFloat = elemType(left).contains(FloatType)
  private lazy val rightIsFloat = elemType(right).contains(FloatType)

  /** Nullable iff an input array OR an element can be null — the default
    * (children only) under-reports: a non-null array with a null element
    * yields NULL here, and when Catalyst proves the arrays non-null (e.g.
    * posexplode's inferred isnotnull filter, literal centroids),
    * nullSafeCodeGen declares no isNull variable and the unconditional
    * `ev.isNull = true` write referenced an undeclared name — janino
    * compile failure, silent interpreted fallback on the hot path. */
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: array length mismatch (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val getA = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // only a nullable expression owns a writable ev.isNull; when the
      // planner proves both arrays null-free the element check is dead
      // code anyway (containsNull = false on both sides)
      val nullElemCheck = if (nullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: array length mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElemCheck
         |  $sum += ($getA) * ($getB);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column-API entry point (classic-session bridge between the public
    * Column and catalyst Expression worlds in Spark 4). */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
