package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the dedup hot path. Both consume an
  * `array<bigint>` of shingle hashes (produced by the codegen'd builtin
  * `xxhash64` inside a `transform`) and fold it in ONE pass of tight JVM
  * arithmetic — the builtin-only formulation needs 64 (simhash) / k
  * (minhash) separate array traversals with per-element expression trees.
  * At 100 TB of documents this is the difference between a scan-bound and
  * a CPU-bound dedup stage.
  */

/** 64-bit SimHash over pre-hashed shingles: bit i of the output is 1 iff
  * ≥ half the input hashes have bit i set. Null/empty input → null.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 >= n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature of length k over pre-hashed shingles: slot j holds
  * min over shingles of mix_j(h) where mix_j is a distinct 64-bit
  * multiply-add-xorshift (splitmix-style) — k cheap mixes of one base
  * hash instead of k full string hashes. Null/empty input → null.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // Seed constants derived once per slot (splitmix64 of the slot index).
  private lazy val mults: Array[Long] = Array.tabulate(k)(j => splitmix(j * 2 + 1) | 1L)
  private lazy val adds: Array[Long] = Array.tabulate(k)(j => splitmix(j * 2 + 2))

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        var m = h * mults(j) + adds(j)
        m ^= (m >>> 29)
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object HashExprs {
  import org.apache.spark.sql.{GraftBridge => EU}

  /** Column wrappers (classic-API expression bridge). */
  def simhash64(hashes: Column): Column =
    EU.column(SimHash64(EU.expression(hashes)))

  def minhashSig(hashes: Column, k: Int): Column =
    EU.column(MinHashSig(EU.expression(hashes), k))
}
