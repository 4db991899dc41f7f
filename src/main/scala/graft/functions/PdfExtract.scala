package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.PdfText

/** PDF → text as a native expression over a binary column: each page's
  * text items joined with `' '`, each page followed by `'\n'` — the
  * reference's pdf.js ingest convention (`/root/reference/App.tsx:46-54`).
  * Decoding is [[graft.multimodal.PdfText]] (dependency-free, JDK zlib);
  * unparseable bytes yield an empty string (the reference surfaces a
  * user-facing error there; inside a 100 TB scan, poisoning the batch is
  * worse than an empty doc the non-empty filter drops). Per-document
  * evaluation ⇒ CodegenFallback costs nothing measurable.
  */
case class PdfExtract(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pdf_extract needs binary, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PdfText.extractText(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pdf_extract"
}

object PdfExtract {
  def apply(bin: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(PdfExtract(eu.expression(bin)))
  }
}
