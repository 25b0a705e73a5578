package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, AllTuples, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator: bounded top-k per key.
  *
  * The declarative formulation — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k` — SORTS every key group in full before discarding
  * all but k rows: O(n log n) per group and the whole group buffered. At
  * ANN scale (millions of candidates per query key) the right physical
  * shape is a bounded heap per key: O(n log k), O(k) memory, single pass.
  * Spark has no such operator, so this is the (c)-tier extension from the
  * build brief: LogicalPlan + Strategy + SparkPlan, attached via
  * `spark.experimental.extraStrategies` (no session rebuild needed).
  *
  * Semantics: emits each key's k smallest rows by `order`, in rank order,
  * with no rank column (compose `orderIndex`-style numbering downstream if
  * ranks are needed). Ties broken by the order expressions only — supply a
  * total order (e.g. append a unique id) for determinism, same contract as
  * the window formulation.
  */
final case class TopKPerKeyNode(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical top-k per key. Planned as a pair, exactly like partial/final
  * aggregation: a `partial = true` instance runs on the map side with no
  * distribution requirement, shrinking each input partition to ≤ k rows
  * per key, so the shuffle the final instance requires moves at most
  * `inputPartitions × keys × k` rows instead of all n — the property that
  * makes per-key top-k viable at 100 TB (top-k is a semigroup: the global
  * top-k of a key is the top-k of the union of per-partition top-ks).
  */
final case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val partExprs = partitionExprs
    val sortOrder = order
    val childOutput = child.output
    val isPartial = partial
    // Memory bound for the map side: the partial pass holds at most
    // flushKeys heaps; past that it EMITS everything held and starts a
    // new epoch. Extra epochs only mean a few more ≤k-per-key rows cross
    // the shuffle — the final pass re-prunes — so a billion-key scan
    // cannot blow partial memory. The final pass never flushes (it must
    // see each key's full candidate set); its state is O(result size).
    val flushKeys =
      session.conf.get("spark.graft.topk.partialFlushKeys", (1 << 17).toString).toInt
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        RowOrdering.create(sortOrder, childOutput)
      // max-heap: head is the WORST of the kept k (largest under the sort
      // order); a new row displaces it when strictly better
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      val unsafeOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => rowOrdering.compare(a, b)

      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty

        private def drain(): Iterator[InternalRow] = {
          val snapshot = heaps.values.toArray
          heaps.clear()
          // dequeueAll drains worst..best; reverse for rank-ascending
          snapshot.iterator.flatMap(_.dequeueAll.reverseIterator)
        }

        private def consume(r: InternalRow): Unit = {
          val row = r.asInstanceOf[UnsafeRow]
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](unsafeOrd)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kLocal) heap.enqueue(row.copy())
          else if (rowOrdering.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(row.copy())
          }
        }

        override def hasNext: Boolean = {
          while (!pending.hasNext && (iter.hasNext || heaps.nonEmpty)) {
            if (!iter.hasNext) pending = drain()
            else {
              consume(iter.next())
              if (isPartial && heaps.size >= flushKeys) pending = drain()
            }
          }
          pending.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** Planner strategy mapping the logical node to the exec. */
  object PlanStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(k, part, ord, child) =>
        // partial (map-side) pass under the final pass; EnsureRequirements
        // inserts the key shuffle between them over the reduced rows
        TopKPerKeyExec(k, part, ord, partial = false,
          TopKPerKeyExec(k, part, ord, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Idempotently attach the strategy to a session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[PlanStrategy.type]))
      spark.experimental.extraStrategies = cur :+ PlanStrategy
  }

  /** One sort key: column name + direction. */
  final case class Sort(name: String, descending: Boolean = false)

  /** Dataset API: k smallest rows per key by the given sort columns.
    * Names resolve against the frame's analyzed output directly — the
    * classic Column→Expression bridge yields lazy ColumnNode wrappers the
    * analyzer won't resolve inside a foreign logical node.
    */
  def topK(df: DataFrame, keys: Seq[String], sort: Seq[Sort], k: Int): DataFrame = {
    import org.apache.spark.sql.{GraftBridge => B}
    install(df.sparkSession)
    val child = B.plan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"topK: no column '$name' in [${child.output.map(_.name).mkString(", ")}]"))
    val sortOrder = sort.map(s =>
      SortOrder(attr(s.name), if (s.descending) Descending else Ascending))
    B.dataFrame(df.sparkSession,
      TopKPerKeyNode(k, keys.map(attr), sortOrder, child))
  }
}
