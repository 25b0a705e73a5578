package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-quality kernels that need byte-level work no builtin expresses. */
object TextKernels {

  // Deflater is stateful and ~µs to construct; one per executor thread,
  // reset() per row. raw mode (nowrap): no zlib header bytes skewing
  // short documents.
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
  }

  /** Deflate-compressed size / raw size of the UTF-8 bytes — the
    * Gopher-style redundancy signal: boilerplate and looped generations
    * compress far below natural prose (natural text ~0.4–0.7 at
    * BEST_SPEED; pathological repetition < 0.1). Empty input → 1.0.
    */
  def compressionRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / bytes.length
  }
}

/** deflate(text).length / text.length. Codegen'd like the hash kernels —
  * the expression stays inside whole-stage codegen; the zlib call
  * dominates per-row cost either way.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "compression_ratio"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.compressionRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.compressionRatio($c);")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object TextExprs {
  import org.apache.spark.sql.{GraftBridge => EU}

  def compressionRatio(text: Column): Column =
    EU.column(CompressionRatio(EU.expression(text)))
}
