package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable long buffer that stops growing past `cap` — the aggregation
  * state of BoundedCollectLong. Once more than `cap` values arrive the
  * buffer is poisoned (`over = true`) and further input is discarded, so
  * per-group state is O(cap) no matter how degenerate the group.
  */
final class LongBuf(var arr: Array[Long], var n: Int, var over: Boolean) {
  def add(v: Long, cap: Int): Unit = {
    if (over) return
    if (n >= cap) { over = true; return }
    if (n == arr.length) {
      val grown = new Array[Long](math.min(cap, math.max(4, arr.length * 2)))
      System.arraycopy(arr, 0, grown, 0, n)
      arr = grown
    }
    arr(n) = v
    n += 1
  }
}

/** collect_list for BIGINT with a hard cap: groups that exceed `cap`
  * values evaluate to NULL (as do groups with < 2 values — a group no
  * pair can come from). Built for LSH candidate generation, where a
  * bucket shared by more than `cap` documents carries no near-dup signal
  * and an unbounded collect_list over it is exactly the skew bomb a
  * 100 TB dedup run must not have. Partial-aggregation state is O(cap)
  * per group on every side of the shuffle.
  */
case class BoundedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongBuf] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_collect_long"

  override def createAggregationBuffer(): LongBuf =
    new LongBuf(new Array[Long](4), 0, false)

  override def update(buf: LongBuf, input: InternalRow): LongBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(a: LongBuf, b: LongBuf): LongBuf = {
    if (b.over) { a.over = true; return a }
    var i = 0
    while (i < b.n && !a.over) { a.add(b.arr(i), cap); i += 1 }
    a
  }

  override def eval(buf: LongBuf): Any = {
    if (buf.over || buf.n < 2) return null
    val out = java.util.Arrays.copyOf(buf.arr, buf.n)
    // merge order across partitions is nondeterministic — sort for a
    // stable output array
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: LongBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + 8 * buf.n)
    bb.put(if (buf.over) 1.toByte else 0.toByte)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val over = bb.get() == 1.toByte
    val n = bb.getInt
    val arr = new Array[Long](math.max(4, n))
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    new LongBuf(arr, n, over)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLong =
    copy(child = newChild)
}

object BoundedCollect {
  import org.apache.spark.sql.{GraftBridge => EU}

  /** Column wrapper: array of the group's values, or NULL if the group
    * has < 2 or > cap of them.
    */
  def boundedCollectLong(c: Column, cap: Int): Column =
    EU.column(BoundedCollectLong(EU.expression(c), cap).toAggregateExpression())
}
