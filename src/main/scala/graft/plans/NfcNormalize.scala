package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — canonical composition, the first step of
  * any multilingual corpus-cleaning pipeline (decomposed "e"+U+0301 and
  * composed "é" must dedup/tokenize/fingerprint identically; Korean jamo
  * sequences must compose to syllable blocks as the reference's Korean
  * templates assume).
  *
  * Spark has no built-in normalizer, so this is a §7.3 custom
  * `Expression` over pure-JVM `java.text.Normalizer` (no new deps).
  * NFC is defined by the Unicode standard and stabilized for assigned
  * codepoints, which is what makes it cross-engine oracle-checkable:
  * DuckDB's `nfc_normalize` (utf8proc) must produce byte-identical
  * output (q_text_nfc). NULL in → NULL out. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.NfcNormalize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** The per-row kernel — also called from generated code. Already-NFC
    * strings (the overwhelmingly common case) skip the re-encode via the
    * quick-check. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))
}
