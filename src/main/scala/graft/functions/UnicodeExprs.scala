package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) — the missing step ahead of
  * every content fingerprint and blocking key: visually-identical
  * NFC/NFD variants ("café" composed U+00E9 vs decomposed e+U+0301)
  * have different bytes, so they defeat hash fingerprints
  * ([[graft.ops.Dedup.exactDedup]]), hash blocking, and sort keys
  * unless the text is canonicalized first. JDK `java.text.Normalizer`
  * (Unicode UAX #15) is the normalizer; DuckDB's `nfc_normalize`
  * implements the same canonical composition, which is what makes the
  * gate's oracle exact.
  *
  * Casefolding is deliberately NOT fused in: compose with `lower` at
  * the call site ([[graft.ops.Cleaning.canonicalUnicode]]) so the
  * collation contract stays visible in the plan. */
object UnicodeKernels {

  private val Nfc = java.text.Normalizer.Form.NFC

  /** NFC-normalize; pure-ASCII inputs (the overwhelming case in a web
    * corpus) return the input object untouched — ASCII is closed under
    * NFC, and the byte scan is far cheaper than String round-tripping. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    val n = bytes.length
    var ascii = true
    while (ascii && i < n) { ascii = (bytes(i) & 0x80) == 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, Nfc)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, Nfc))
  }
}

/** `unicode_nfc(str)` — see [[UnicodeKernels.nfc]]. */
case class UnicodeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_nfc"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelCheck.isString(child, "unicode_nfc input")
  override def nullSafeEval(s: Any): Any =
    UnicodeKernels.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnicodeKernels.nfc($s);")
  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNfc = copy(child = newChild)
}
