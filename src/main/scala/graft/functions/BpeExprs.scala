package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** O(n) greedy-leftmost BPE merge over a token array — the codegen'd
  * kernel behind [[graft.text.Bpe.applyMerge]]. A builtin `aggregate`
  * fold expresses the same scan but copies the accumulator array per
  * element (quadratic) and runs interpreted; this is one linear pass.
  */
object BpeKernels {

  def merge(arr: ArrayData, l: UTF8String, r: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var o = 0
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (t != null && i + 1 < n && !arr.isNullAt(i + 1) &&
        t.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out(o) = merged
        i += 2
      } else {
        out(o) = t
        i += 1
      }
      o += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }
}

/** `bpe_merge(tokens, l, r, sep)`: greedy leftmost single-rule BPE
  * rewrite; the rule strings ride as codegen reference objects.
  */
case class BpeMerge(child: Expression, l: String, r: String, sep: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge"

  private lazy val lU = UTF8String.fromString(l)
  private lazy val rU = UTF8String.fromString(r)
  private lazy val mergedU = UTF8String.fromString(l + sep + r)

  override def nullSafeEval(input: Any): Any =
    BpeKernels.merge(input.asInstanceOf[ArrayData], lU, rU, mergedU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("l", lU, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("r", rU, "org.apache.spark.unsafe.types.UTF8String")
    val mRef = ctx.addReferenceObj("m", mergedU, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.merge($c, $lRef, $rRef, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

object BpeExprs {
  import org.apache.spark.sql.{GraftBridge => EU}

  def bpeMerge(tokens: Column, l: String, r: String, sep: String): Column =
    EU.column(BpeMerge(EU.expression(tokens), l, r, sep))
}
