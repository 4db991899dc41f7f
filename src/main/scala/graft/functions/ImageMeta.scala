package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image metadata decode over a binary column — the third real
  * binary decoder beside [[PdfExtract]] and [[GunzipText]], making the
  * image modality of the multimodal column genuinely parsed rather
  * than stubbed (see [[graft.multimodal.Multimodal]]). Dependency-free
  * header parsing of the three container formats a crawl corpus
  * actually carries:
  *
  *   - PNG  (ISO 15948): 8-byte signature, then the IHDR chunk —
  *     width/height as big-endian u32 at offsets 16/20, bit depth at
  *     24. The IHDR length (13) and type are validated.
  *   - JPEG (ITU T.81): SOI marker, then a marker-segment walk to the
  *     first SOF frame header (C0–CF minus C4/C8/CC) — precision,
  *     height, width. Fill bytes (repeated FF) and APPn/COM segments
  *     are skipped by their declared lengths.
  *   - GIF  (87a/89a): logical screen descriptor — width/height as
  *     little-endian u16 at offsets 6/8, bits-per-pixel from the
  *     packed byte's color-table size field.
  *
  * Output: `struct<format, width, height, bit_depth>`; anything
  * unparseable — truncated, corrupt, or an unknown format — is NULL,
  * never a throw (one bad file must not poison a 10^9-row batch; the
  * [[GunzipText]]/[[PdfExtract]] contract). Per-row evaluation over
  * whole payloads ⇒ CodegenFallback costs nothing measurable. */
case class ImageMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_meta needs binary, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    ImageMeta.parse(b) match {
      case null => null
      case (f, w, h, d) => InternalRow(UTF8String.fromString(f), w, h, d)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "image_meta"
}

object ImageMeta {

  def apply(bin: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(ImageMeta(eu.expression(bin)))
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** (format, width, height, bit_depth), or null if unparseable. */
  private[graft] def parse(b: Array[Byte]): (String, Int, Int, Int) = {
    if (b == null || b.length < 6) return null
    if (b.length >= 26 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      return parsePng(b)
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
      return parseJpeg(b)
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return parseGif(b)
    null
  }

  private def parsePng(b: Array[Byte]): (String, Int, Int, Int) = {
    // first chunk must be IHDR with its fixed 13-byte payload
    if (be32(b, 8) != 13L) return null
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    ("png", w.toInt, h.toInt, u8(b, 24))
  }

  private def parseJpeg(b: Array[Byte]): (String, Int, Int, Int) = {
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return null // desynchronized marker stream
      var j = i
      while (j + 1 < b.length && u8(b, j + 1) == 0xff) j += 1 // fill bytes
      if (j + 1 >= b.length) return null
      val marker = u8(b, j + 1)
      i = j + 2
      marker match {
        case 0xd9 => return null                   // EOI before any SOF
        case 0x01 | 0xd8 => ()                     // standalone, no payload
        case m if m >= 0xd0 && m <= 0xd7 => ()     // RSTn, no payload
        case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOF frame header: len(2) precision(1) height(2) width(2)
          if (i + 6 >= b.length) return null
          val prec = u8(b, i + 2)
          val h = be16(b, i + 3); val w = be16(b, i + 5)
          if (w <= 0 || h <= 0) return null
          return ("jpeg", w, h, prec)
        case _ =>
          if (i + 1 >= b.length) return null
          val len = be16(b, i)
          if (len < 2) return null
          i += len
      }
    }
    null
  }

  private def parseGif(b: Array[Byte]): (String, Int, Int, Int) = {
    if (b.length < 11) return null
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) return null
    val depth = (u8(b, 10) & 0x07) + 1 // global color table size → bits/pixel
    ("gif", w, h, depth)
  }
}
