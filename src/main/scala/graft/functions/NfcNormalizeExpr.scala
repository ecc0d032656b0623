package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization of a string column — the
  * canonicalization step text dedup is silently wrong without: "é"
  * arrives from real corpora both precomposed (U+00E9) and decomposed
  * (e + U+0301), and a hash/groupBy dedup treats them as different
  * documents unless every comparison key is normalized first (the
  * Unicode TR-15 canonical-equivalence contract; DuckDB ships the
  * same primitive as `nfc_normalize`, which is what makes the oracle
  * cross-engine exact).
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §7.3 tier (b), the
  * [[DotProduct]] precedent): Spark has NO normalization built-in, a
  * Scala UDF would be opaque to codegen and serialize per-row, and
  * `java.text.Normalizer` is a JDK static — so the generated code is
  * one static call inside whole-stage codegen, NULL-propagating like
  * any unary string function. The quick-check fast path inside the
  * JDK makes already-NFC text (the overwhelming majority of any real
  * corpus) nearly free.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string column, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column-API entry point (the [[DotProduct.dot_product]] bridge). */
  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
