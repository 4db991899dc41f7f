package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization — multilingual corpus hygiene:
  * the same visible text can arrive composed (é) or decomposed (e +
  * U+0301) from different sources, which silently breaks exact dedup
  * hashes, token identity, and shingle matching. Normalizing at ingest
  * makes every downstream byte-level operator see one canonical form.
  * JDK `java.text.Normalizer` only (Unicode-standard canonical
  * composition — the DuckDB oracle's utf8proc implements the same
  * algorithm); per-row, no shuffle, CodegenFallback per the
  * per-document-cost convention. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: most corpus text is already NFC — isNormalized is a
    // single quick-check pass, no allocation
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def apply(text: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(NfcNormalize(eu.expression(text)))
  }
}
