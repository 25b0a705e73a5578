package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression —
  * the canonical first step of text cleaning: crawled text mixes
  * composed and decomposed forms of the same glyph ("é" as one codepoint
  * or as e+U+0301), which breaks exact dedup, shingling, and vocabulary
  * counting unless every document is folded to one canonical form first.
  * Complements [[Unidecode]] (which destroys information down to ASCII);
  * normalization is lossless within Unicode.
  */
object NormalizeKernel {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val in = s.toString
    // fast path: NFC/NFKC of ASCII (the overwhelming majority of web
    // text) is the identity — skip the Normalizer machinery
    if (Normalizer.isNormalized(in, form)) s
    else UTF8String.fromString(Normalizer.normalize(in, form))
  }
}

/** `unicode_normalize(s)`: normalize to the given form. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val f = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    NormalizeKernel.normalize(input.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("form", f, "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeKernel.normalize($c, $fRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object NormalizeExprs {
  import org.apache.spark.sql.{GraftBridge => EU}

  def unicodeNormalize(s: Column, form: String): Column =
    EU.column(UnicodeNormalize(EU.expression(s), form))
}
