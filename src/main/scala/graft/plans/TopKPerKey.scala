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
  * The heap runs in TWO phases since r11 (the generalization of the
  * r10 assignCells map-side-collapse fix to arbitrary k and arbitrary
  * SortOrder semantics): [[PartialTopKPerKeyExec]] prunes each MAP
  * partition to ≤ k rows per key BEFORE the exchange — so the shuffle
  * carries keys·k rows per task instead of every input row — and
  * [[TopKPerKeyExec]] finishes per key after it. Partial pruning is
  * advisory (a superset is always correct), so the partial phase never
  * fails on its memory budget: crossing it FLUSHES the current heaps
  * downstream and keeps going — each key's true top-k is contained in
  * the union of its segment top-k's — while the final phase keeps the
  * fail-fast contract.
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
    // Memory contract: the heap map holds O(distinct-keys-per-task · k)
    // rows on the JVM heap with no spill. Guarded: crossing the
    // configured row budget fails fast with the remedy (the window
    // formulation sorts via Spark's spillable buffers) instead of
    // OOM-killing the executor.
    val maxHeapRows = conf
      .getConfString(TopK.maxHeapRowsKey, TopK.defaultMaxHeapRows.toString).toLong
    val kLocal = k
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
        val heap = heaps.getOrElseUpdate(key.copy(), {
          if (heaps.size.toLong * kLocal >= maxHeapRows) {
            throw new IllegalStateException(
              s"TopKPerKey heap budget exceeded: > ${heaps.size} keys × k=$kLocal " +
                s"rows in one task (budget ${TopK.maxHeapRowsKey}=$maxHeapRows). " +
                "Use TopK.perKey with an estimatedKeys hint (window fallback) " +
                "or raise the budget.")
          }
          scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
        })
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

/** Map-side top-k pruning (no required distribution — runs before the
  * exchange the final [[TopKPerKeyExec]] requests). Emits, per input
  * partition, a SUPERSET of each key's top-k (exactly top-k per heap
  * segment; the budget flush starts a new segment), which the final
  * phase reduces exactly. Uses the same generated SortOrder ordering,
  * so null ordering and mixed directions are preserved bit-for-bit —
  * the cases [[ArgminRewrite]]'s min/max(struct) form must bail on. */
case class PartialTopKPerKeyExec(keys: Seq[Expression],
    order: Seq[SortOrder], k: Int, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val boundOrder = order.map(BindReferences.bindReference(_, child.output))
    val keyExprs = keys
    val childOutput = child.output
    // the map side takes its own budget (default: the shared one) —
    // it bounds the PRE-flush working set, while the final phase's
    // budget is a hard fail-fast contract. FLOORED at k: below k the
    // fresh-map insert of the carried-over `pending` row could refuse
    // (heaps.size * k >= budget holds already at size 0) and its
    // ignored return value would silently DROP the row (ADVICE-r11 /
    // VERDICT-r11 #4). At the floor every segment holds exactly one
    // key's heap — degenerate but exact; TopKSpec pins
    // partialMaxHeapRows=1, k=2 to exact results.
    val kLocal = k
    val maxHeapRows = math.max(kLocal.toLong,
      conf.getConfString(TopK.partialMaxHeapRowsKey,
        conf.getConfString(TopK.maxHeapRowsKey,
          TopK.defaultMaxHeapRows.toString)).toLong)
    child.execute().mapPartitions { iter =>
      val ordering = GenerateOrdering.generate(boundOrder, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val heapOrd = ordering.asInstanceOf[Ordering[InternalRow]]
        .asInstanceOf[Ordering[UnsafeRow]]
      // Streaming segments: consume input until the heap budget would
      // be crossed, EMIT that segment's top-k's downstream, drop the
      // map, continue — true flush-to-downstream, so one segment's
      // heaps is all this phase ever holds. (The first cut chained
      // lazy `++` over a reassigned var — every segment drained the
      // FINAL map at consumption time and rows were lost; the TopKSpec
      // budget test caught it. Segments must be strict boundaries.)
      var pending: UnsafeRow = null
      def nextSegment(): Iterator[InternalRow] = {
        if (pending == null && !iter.hasNext) return null
        val heaps = new scala.collection.mutable.HashMap[
          UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
        // returns false when the row needs a NEW segment (budget)
        def insert(row: InternalRow, preCopied: Boolean): Boolean = {
          val key = keyProj(row)
          var heap = heaps.getOrElse(key, null)
          if (heap == null) {
            if (heaps.size.toLong * kLocal >= maxHeapRows) return false
            heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kLocal) {
            heap.enqueue(if (preCopied) row.asInstanceOf[UnsafeRow]
              else row.copy().asInstanceOf[UnsafeRow])
          } else if (ordering.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(if (preCopied) row.asInstanceOf[UnsafeRow]
              else row.copy().asInstanceOf[UnsafeRow])
          }
          true
        }
        if (pending != null) {
          insert(pending, preCopied = true) // fresh map — cannot refuse
          pending = null
        }
        var full = false
        while (!full && iter.hasNext) {
          val row = iter.next()
          if (!insert(row, preCopied = false)) {
            pending = row.copy().asInstanceOf[UnsafeRow]
            full = true
          }
        }
        heaps.iterator.flatMap { case (_, h) => h.dequeueAll.reverseIterator }
      }
      new scala.collection.AbstractIterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!cur.hasNext) {
            val seg = nextSegment()
            if (seg == null) return false
            cur = seg
          }
          true
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty partition")
          cur.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): PartialTopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // partial phase togglable for controlled A/Bs (default on)
      val partial = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(TopK.partialEnabledKey, "true").toBoolean
      val planned = planLater(child)
      val below = if (partial)
        PartialTopKPerKeyExec(keys, order, k, planned) else planned
      TopKPerKeyExec(keys, order, k, below) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Per-task heap budget (rows ≈ distinct keys × k). The default,
    * 8 Mi rows of UnsafeRow references, is comfortable for a multi-GiB
    * executor; crossing it fails fast rather than OOM. */
  val maxHeapRowsKey = "graft.topk.maxHeapRows"
  val defaultMaxHeapRows: Long = 8L * 1024 * 1024

  /** Map-side (partial-phase) working-set budget; crossing it flushes
    * the current segment downstream instead of failing (a superset per
    * key is always correct — the final phase re-prunes). Defaults to
    * [[maxHeapRowsKey]]'s value. */
  val partialMaxHeapRowsKey = "graft.topk.partialMaxHeapRows"

  /** Plan-time switch for the map-side partial phase (default true) —
    * exists for controlled same-session A/Bs of the shuffle saving. */
  val partialEnabledKey = "graft.topk.partial.enabled"

  /** Top-k rows per key group, ranked by `orderBy` ((column, descending)
    * pairs — give a total order with a unique tiebreak for deterministic
    * results). Attributes resolve by name against the analyzed child, so
    * the node is born fully resolved (custom nodes don't get the
    * analyzer's column-node resolution pass).
    *
    * `estimatedKeys` is the memory-contract escape hatch: the heap exec
    * holds keys·k rows per task un-spillably, so when the caller knows
    * the key cardinality is huge (keys·k above the per-task budget ×
    * shuffle parallelism), this routes to [[perKeyWindow]] — Spark's
    * sort-based ranking with spillable buffers — same result, different
    * cost shape (sort vs heap). Unset (-1) keeps the heap operator,
    * which guards itself at runtime. */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      estimatedKeys: Long = -1L): DataFrame = {
    if (estimatedKeys > 0) {
      val tasks = math.max(1,
        df.sparkSession.sessionState.conf.numShufflePartitions.toLong)
      val budget = df.sparkSession.conf
        .get(maxHeapRowsKey, defaultMaxHeapRows.toString).toLong
      if (estimatedKeys / tasks * k > budget)
        return perKeyWindow(df, keyCols, orderBy, k)
    }
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

  /** The window formulation of the same contract: one hash shuffle plus
    * a per-partition SORT (spillable via UnsafeExternalSorter) — the
    * fallback when keys·k exceeds what a heap map should hold. */
  def perKeyWindow(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val sorts = orderBy.map { case (name, desc) =>
      if (desc) col(name).desc else col(name).asc
    }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(sorts: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }
}
