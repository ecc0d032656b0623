package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom expressions for SQL use.
  *
  * Wire-up (either works):
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - code:   `SparkSession.builder().withExtensions(new GraftExtensions)`
  *  - ad hoc: `GraftExtensions.register(spark)` on a live session
  *
  * After registration `spark.sql("SELECT dot_product(a, b) ...")` plans the
  * codegen'd [[DotProduct]] expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    // optimizer surface: abs-range predicates become pushable ranges
    ext.injectOptimizerRule(_ => graft.plans.AbsRangeRewrite)
    // calendar-bucket equality on dates becomes a pushable range
    ext.injectOptimizerRule(_ => graft.plans.DateTruncRangeRewrite)
    // planner surface: bounded-heap top-k per key (no per-partition sort)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  private val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  private val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSim(children(0), children(1)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
  }
}
