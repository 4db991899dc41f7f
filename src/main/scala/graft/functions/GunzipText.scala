package graft.functions

import java.util.zip.GZIPInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Decompress a gzip binary column to UTF-8 text — the ingest shape for
  * web-archive corpora (WARC/CC payloads arrive gzip-compressed; at
  * 100 TB the decompression must run inside the scan, per row, not as
  * a driver-side pre-pass). JDK zlib only, no added dependency.
  *
  * Edge semantics match [[PdfExtract]]: a null input is null, bytes
  * that are not valid gzip yield NULL (not a throw — one corrupt
  * document must not poison a 10^9-row batch; downstream non-empty /
  * null filters drop it with lineage intact). Per-document evaluation
  * ⇒ CodegenFallback costs nothing measurable. */
case class GunzipText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gunzip_text needs binary, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 4))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = in.read(buf)
        }
        UTF8String.fromBytes(out.toByteArray)
      } finally in.close()
    } catch { case _: java.io.IOException => null }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gunzip_text"
}

object GunzipText {
  def apply(bin: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(GunzipText(eu.expression(bin)))
  }
}
