package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: item → count, capped at `capacity`
  * tracked items. Inserting a new item into a full summary decrements
  * every count (dropping zeros) — the classic frequent-items guarantee:
  * a reported count undercounts a true count by at most n/(capacity+1),
  * and any item with true count above that bound IS tracked. With at
  * most `capacity` distinct items the summary is EXACT.
  */
final class FreqSummary(val m: java.util.HashMap[UTF8String, java.lang.Long]) {

  def add(item: UTF8String, inc: Long, capacity: Int): Unit = {
    // value type is BOXED java.lang.Long: a primitive-valued map would
    // silently unbox get()'s null to 0 and break the miss check
    val cur = m.get(item)
    if (cur != null || inc == 0) {
      if (cur != null) m.put(item, java.lang.Long.valueOf(cur.longValue + inc))
      return
    }
    if (m.size < capacity) { m.put(item, java.lang.Long.valueOf(inc)); return }
    // full and unseen: absorb min(inc, smallest-count) as a global
    // decrement, retry with the remainder (MG batch-decrement step)
    var minC = Long.MaxValue
    val it0 = m.values().iterator()
    while (it0.hasNext) minC = math.min(minC, it0.next().longValue)
    val dec = math.min(inc, minC)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.longValue <= dec) it.remove()
      else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - dec))
    }
    if (inc > dec) add(item, inc - dec, capacity)
  }
}

/** `freq_items(tokens, capacity)`: one-pass heavy hitters over an
  * `array<string>` column — Misra–Gries summaries as the partial-agg
  * state, so token counting needs NO token-keyed shuffle at all: each
  * task condenses its slice into one O(capacity) summary and only
  * summaries cross the wire (the wordcount exchange disappears; compare
  * q52). Exact whenever the true vocabulary fits in `capacity`;
  * otherwise counts are lower bounds with error ≤ n/(capacity+1), and
  * trim timing depends on merge order (approximate mode is run-stable
  * only in its guarantees, not its exact values — like every sketch).
  *
  * Result: array<struct<item,cnt>> sorted by (cnt desc, item).
  */
case class FreqItems(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSummary] with UnaryLike[Expression] {
  require(capacity > 0, "capacity must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): FreqSummary =
    new FreqSummary(new java.util.HashMap[UTF8String, java.lang.Long]())

  override def update(buf: FreqSummary, input: InternalRow): FreqSummary = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          // copy: the UTF8String may point into a reused row buffer
          buf.add(arr.getUTF8String(i).clone(), 1L, capacity)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: FreqSummary, b: FreqSummary): FreqSummary = {
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.add(e.getKey, e.getValue.longValue, capacity)
    }
    a
  }

  override def eval(buf: FreqSummary): Any = {
    val entries = new Array[(UTF8String, Long)](buf.m.size)
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue.longValue); i += 1 }
    val sorted = entries.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      InternalRow(item, cnt)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: FreqSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue.longValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    new FreqSummary(m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

/** `freq_items_weighted(item, weight, capacity)`: Misra–Gries over
  * PRE-COUNTED rows — the merge half of the cross-run heavy-hitters
  * artifact. A run's summary persists as plain (item, cnt) rows; a later
  * run re-aggregates the union of persisted summaries with this weighted
  * insert, which is exactly the MG summary-merge (weighted add with
  * batch decrement). With total distinct ≤ capacity the merged counts
  * equal a single pass over the concatenated corpus; over capacity the
  * standard undercount bound holds on the combined stream.
  */
case class FreqItemsWeighted(
    left: Expression,
    right: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSummary]
  with ImplicitCastInputTypes
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(capacity > 0, "capacity must be positive")

  // Declared input types turn a mistyped weight column (e.g. IntegerType)
  // into an analysis-time implicit widening cast instead of the
  // executor-side ClassCastException the bare asInstanceOf[Long] in
  // update() would throw.
  // Seq[DataType] (not AbstractDataType, which is private[sql]) — a
  // covariant override Spark accepts from outside org.apache.spark.sql.
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_weighted"

  override def createAggregationBuffer(): FreqSummary =
    new FreqSummary(new java.util.HashMap[UTF8String, java.lang.Long]())

  override def update(buf: FreqSummary, input: InternalRow): FreqSummary = {
    val item = left.eval(input)
    val w = right.eval(input)
    if (item != null && w != null) {
      val inc = w.asInstanceOf[Long]
      require(inc >= 0, "freq_items_weighted: negative weight")
      buf.add(item.asInstanceOf[UTF8String].clone(), inc, capacity)
    }
    buf
  }

  override def merge(a: FreqSummary, b: FreqSummary): FreqSummary = {
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.add(e.getKey, e.getValue.longValue, capacity)
    }
    a
  }

  override def eval(buf: FreqSummary): Any = {
    val entries = new Array[(UTF8String, Long)](buf.m.size)
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue.longValue); i += 1 }
    val sorted = entries.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      InternalRow(item, cnt)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: FreqSummary): Array[Byte] =
    FreqItems(left, capacity).serialize(buf)
  override def deserialize(bytes: Array[Byte]): FreqSummary =
    FreqItems(left, capacity).deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FreqItemsWeighted =
    copy(left = newLeft, right = newRight)
}

object FreqItemsAgg {
  import org.apache.spark.sql.{GraftBridge => EU}

  /** Heavy hitters of an array<string> column as one bounded-state
    * aggregate; see [[FreqItems]].
    */
  def freqItems(tokens: Column, capacity: Int): Column =
    EU.column(FreqItems(EU.expression(tokens), capacity).toAggregateExpression())

  /** Weighted Misra–Gries over (item, count) rows — merges persisted
    * run summaries; see [[FreqItemsWeighted]].
    */
  def freqItemsWeighted(item: Column, weight: Column, capacity: Int): Column =
    EU.column(FreqItemsWeighted(EU.expression(item), EU.expression(weight),
      capacity).toAggregateExpression())
}
