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

/** Distinct character-n-gram hashes of a string in ONE pass — replaces the
  * builtin `transform(sequence(...), substring)` + `array_distinct`
  * formulation, which materializes every shingle as a UTF8String and
  * dominated the dedup profile (17 s of a 26 s stage at sf0.1). Output
  * order is sorted (deterministic); consumers (MinHashSig, SimHash64,
  * hash-set Jaccard) are order-insensitive.
  */
case class ShingleHash64(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Long])
    val m = math.max(1, len - n + 1)
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 1125899906842597L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) { h = h * 31 + s.charAt(j); j += 1 }
      // splitmix finalizer spreads the weak polynomial bits
      h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
      h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
      hashes(i) = h ^ (h >>> 31)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place unique
    var w = 1
    i = 1
    while (i < m) {
      if (hashes(i) != hashes(i - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object HashExprs {
  import org.apache.spark.sql.{GraftBridge => EU}

  /** Column wrappers (classic-API expression bridge). */
  def simhash64(hashes: Column): Column =
    EU.column(SimHash64(EU.expression(hashes)))

  def minhashSig(hashes: Column, k: Int): Column =
    EU.column(MinHashSig(EU.expression(hashes), k))

  def shingleHash64(text: Column, n: Int): Column =
    EU.column(ShingleHash64(EU.expression(text), n))
}
