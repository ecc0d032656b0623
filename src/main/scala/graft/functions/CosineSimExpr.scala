package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity over two `array<float>` / `array<double>`
  * columns in ONE pass: dot product and both squared norms accumulate in
  * a single loop, where the composed form
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` walks each array three
  * times (and, under codegen, re-null-checks and re-bounds-checks each
  * walk). On the ANN hot paths (brute-force scan, KNN-graph bucket
  * verify, rerank stages) this third of the memory traffic is the whole
  * game — the expression tree above it is a single division.
  *
  * BIT-IDENTICAL to the composed [[DotProduct]] form: each of the three
  * accumulators is an independent sequential left-to-right double fold —
  * fusing the loops reorders nothing — and the final expression applies
  * the same `/(sqrt*sqrt)` tree, so zero-norm inputs produce the exact
  * same NaN/Infinity the composed form produced (callers' guards keep
  * working; the q36/q41/q96 oracles keep hashing). NULL array or NULL
  * element → NULL; ragged lengths RAISE (a length mismatch in an
  * embedding column is a data bug — same contract as [[DotProduct]]).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float>/array<double> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private lazy val leftIsFloat = elemType(left).contains(FloatType)
  private lazy val rightIsFloat = elemType(right).contains(FloatType)

  /** Same nullability contract (and janino lesson) as [[DotProduct]]:
    * element nulls make the VALUE null even when the planner proves the
    * array references non-null. */
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
        s"cosine_sim: array length mismatch (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sab += x * y; saa += x * x; sbb += y * y
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val nullElemCheck = if (nullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: array length mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElemCheck
         |  double $x = $getA;
         |  double $y = $getB;
         |  $sab += $x * $y; $saa += $x * $x; $sbb += $y * $y;
         |}
         |${ev.value} = $sab / (java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column-API entry point (same classic-session bridge as
    * [[DotProduct.dot_product]]). */
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
