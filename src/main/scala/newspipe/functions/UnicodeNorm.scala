package newspipe.functions

import org.apache.spark.sql.{Column, NewspipeSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static Unicode-normalization kernel (`java.text.Normalizer` — in the
  * JDK, zero deps). The canonical pre-dedup cleaning step of the CCNet /
  * RedPajama-style corpus pipelines: visually-identical strings with
  * different codepoint sequences (decomposed accents, compatibility
  * ligatures, fullwidth forms) hash to DIFFERENT MinHash/SimHash/exact
  * digests unless the corpus is normalized first, silently deflating every
  * dedup family's recall.
  *
  * ASCII fast path: a string whose UTF-8 byte count equals its character
  * count is pure ASCII, and every normalization form is the identity on
  * ASCII (no canonical or compatibility decompositions below U+0080) — the
  * common-case corpus row skips the String round-trip entirely. This is a
  * per-row scalar kernel: corpus-linear, shuffle-free, codegen'd into
  * whole-stage pipelines like the tokenize/shingle kernels it feeds.
  */
object UnicodeNormKernel {
  // form ids keep the codegen call site a primitive int, not an enum load
  val NfcId = 0; val NfdId = 1; val NfkcId = 2; val NfkdId = 3

  def formId(form: String): Int = form.toUpperCase match {
    case "NFC" => NfcId
    case "NFD" => NfdId
    case "NFKC" => NfkcId
    case "NFKD" => NfkdId
    case other => throw new IllegalArgumentException(
      s"unicode_normalize form must be NFC|NFD|NFKC|NFKD, got '$other'")
  }

  private def form(id: Int): java.text.Normalizer.Form = id match {
    case NfcId => java.text.Normalizer.Form.NFC
    case NfdId => java.text.Normalizer.Form.NFD
    case NfkcId => java.text.Normalizer.Form.NFKC
    case _ => java.text.Normalizer.Form.NFKD
  }

  def normalize(text: UTF8String, formId: Int): UTF8String = {
    if (text.numBytes == text.numChars) return text // pure ASCII: identity
    val s = text.toString
    val f = form(formId)
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
}

/** Unicode normalization as a native codegen'd expression:
  * `UnicodeNormalize(text, "NFC")`. Null-propagating; the form is a
  * construction-time constant (validated eagerly, baked into codegen as a
  * literal int).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with Serializable {

  private val fid = UnicodeNormKernel.formId(form) // validates eagerly

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.normalize(input.asInstanceOf[UTF8String], fid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = newspipe.functions.UnicodeNormKernel.normalize($c, $fid);")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Column API: `unicodeNormalize($"text")` → NFC by default. */
  def apply(text: Column, form: String): Column =
    NewspipeSqlBridge.column(
      UnicodeNormalize(NewspipeSqlBridge.expression(text), form))
  def nfc(text: Column): Column = apply(text, "NFC")
  def nfkc(text: Column): Column = apply(text, "NFKC")
}
