package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy

/** Custom whole-operator stack (SURVEY.md §7.1 path (c)): per-key top-k.
  *
  * Spark's idiomatic formulation — `row_number().over(Window...)` then
  * `filter(rn <= k)` — must SORT every partition's full data before it
  * can rank. This operator keeps only a k-bounded heap per key: one
  * hash shuffle, no sort, O(n log k) per partition, memory O(keys·k)
  * instead of a full partition sort buffer. At 100 TB with hot keys the
  * difference is a spilled sort vs a heap that never grows.
  *
  * Pieces: [[TopKPerKey]] (logical), [[TopKPerKeyExec]] (physical with
  * ClusteredDistribution so the planner inserts the hash exchange),
  * [[TopKStrategy]] (planner rule), registered via
  * [[graft.engine.GraftExtensions]]; [[TopK.perKey]] is the user API.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Ask the planner to co-locate rows by key (hash exchange). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val boundOrder = order.map(BindReferences.bindReference(_, child.output))
    val keyExprs = keys
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val ordering = GenerateOrdering.generate(boundOrder, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // per key: bounded "worst on top" heap of the current best k rows
      val heaps = new scala.collection.mutable.HashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      val heapOrd = ordering.asInstanceOf[Ordering[InternalRow]]
        .asInstanceOf[Ordering[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd))
        if (heap.size < k) {
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // per-key rows in sort order
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top-k rows per key group, ranked by `orderBy` ((column, descending)
    * pairs — give a total order with a unique tiebreak for deterministic
    * results). Attributes resolve by name against the analyzed child, so
    * the node is born fully resolved (custom nodes don't get the
    * analyzer's column-node resolution pass). */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = ColumnBridge.analyzedPlan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name)}"))
    val keys = keyCols.map(attr)
    val order = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(df.sparkSession, TopKPerKey(keys, order, k, child))
  }
}
