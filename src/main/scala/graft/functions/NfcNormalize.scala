package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonicalization step in front of exact dedup / fingerprinting on
  * multilingual corpora: visually identical strings with different
  * codepoint sequences ("é" composed vs "e" + U+0301) must hash the same
  * or near-identical documents silently escape dedup.
  *
  * Spark has no built-in normalizer; a Scala UDF would break codegen and
  * serialize through the generic UDF machinery per row. This expression
  * calls `java.text.Normalizer` (ICU-equivalent for NFC) directly from
  * the generated Java — one virtual call per row, stays inside
  * whole-stage codegen. DuckDB's `nfc_normalize` implements the same
  * Unicode normalization form, so outputs are oracle-comparable.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Column-level API: `nfc_normalize(textCol)`. */
  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
