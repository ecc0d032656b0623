package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Logical "k best rows per key" — the whole-operator Catalyst tier
  * (custom LogicalPlan + Strategy + SparkPlan) for the one top-k shape
  * the built-ins can't plan well: `row_number() OVER (PARTITION BY key
  * ORDER BY ...) <= k` must SORT every key's full row set inside each
  * shuffle partition before discarding all but k rows. This node keeps
  * a bounded heap per key instead — one hash shuffle (clustered
  * distribution, NO sort requirement), one streaming pass, O(keys·k)
  * memory — the classic rank-pushdown every warehouse implements.
  * At 100 TB the difference is the full sort of every partition vs a
  * heap update per row.
  *
  * Semantics contract: `order` must be a TOTAL order over the rows a
  * caller distinguishes (tie columns!); with ties at the k boundary the
  * kept SET is otherwise heap-arbitrary. Output row order within a key
  * is unspecified (consumers sort if they care — same as any scan).
  * Memory contract: per-partition heap memory is O(distinct keys in
  * partition × k) rows and does NOT spill — right for many-keys/
  * small-k (the top-k-per-group workload); for tiny key cardinality
  * with huge k use the window form, which spills.
  */
case class TopKPerKey(keyExprs: Seq[Expression], order: Seq[SortOrder],
                      k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

/** Plans [[TopKPerKey]] to [[TopKPerKeyExec]]; inject via
  * `spark.experimental.extraStrategies` (the
  * [[graft.operators.TopK.perKey]] helper does) or
  * `injectPlannerStrategy` ([[graft.functions.GraftExtensions]]). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per key. Requires only
  * `ClusteredDistribution(keys)` from its child — EnsureRequirements
  * inserts the hash exchange and NOTHING sorts: each partition streams
  * once, keeping per key a size-k max-heap under the requested order
  * (head = worst kept row; a new row replaces it iff strictly better).
  * Rows entering a heap are copied (iterator rows are reused buffers);
  * comparisons run through the codegen'd
  * [[org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering]]
  * with interpreted fallback. */
case class TopKPerKeyExec(keyExprs: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val kLocal = k
    val orderLocal = order
    val keysLocal = keyExprs
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, schema)
      val cmp = new LazilyGeneratedOrdering(orderLocal, schema)
      val heaps = new java.util.HashMap[InternalRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kLocal, cmp.reverse)
          heaps.put(key.copy(), q)
        }
        if (q.size() < kLocal) q.add(row.copy())
        else if (cmp.compare(row, q.peek()) < 0) {
          q.poll(); q.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }
}
