package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending,
  Expression, SortOrder}

/** User-facing door to the [[graft.plans.TopKPerKey]] custom operator:
  * "the k best rows per key" without the window form's full per-
  * partition sort. See the logical node's scaladoc for the memory and
  * total-order contracts. */
object TopK {

  /** Top `k` rows per `keyCols` group under `orderBy` — each entry is
    * (column, ascending?); defaults match ORDER BY (ASC → NULLS FIRST,
    * DESC → NULLS LAST), so results equal the
    * `row_number() <= k` window form whenever `orderBy` is a total
    * order. Resolves columns case-insensitively against the frame,
    * injects [[graft.plans.TopKStrategy]] into the session once, and
    * plans ONE hash exchange + a streaming heap pass — no sort. */
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(keyCols.nonEmpty, "keyCols required")
    require(orderBy.nonEmpty, "orderBy required")
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    org.apache.spark.sql.graftglue.GraftGlue.ensureStrategy(spark,
      graft.plans.TopKStrategy)
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"column '$n' not found among ${lp.output.map(_.name).mkString(", ")}"))
    val keys: Seq[Expression] = keyCols.map(attr)
    val ord = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftglue.GraftGlue.ofRows(spark,
      graft.plans.TopKPerKey(keys, ord, k, lp))
  }
}
