package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PNG `tEXt` metadata extraction over a binary column — the
  * image-CAPTION reader of the multimodal family ([[ImageMeta]] reads
  * dimensions; this reads the textual payload a caption-bearing corpus
  * ships inside the image file itself, the pairing signal LAION-style
  * image–text datasets are built from).
  *
  * ISO 15948 §11.3.3: after the 8-byte signature, PNG is a sequence of
  * `length(4, BE) | type(4, ASCII) | data(length) | crc(4)` chunks; a
  * `tEXt` chunk's data is `keyword | 0x00 | text`, both Latin-1. This
  * walks the chunk sequence bounds-checked and returns every tEXt pair
  * as `array<struct<key, value>>` in file order — an empty array for a
  * valid PNG with no tEXt, NULL for anything that is not a parseable
  * PNG (truncated mid-chunk, bad signature, missing keyword
  * terminator): the [[ImageMeta]]/[[GunzipText]] corrupt-input
  * contract — never a throw. CRCs are not verified (metadata reads
  * stay cheap; a flipped bit in IDAT must not hide a caption). */
case class PngText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_text needs binary, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val pairs = PngText.parse(input.asInstanceOf[Array[Byte]])
    if (pairs == null) null
    else new GenericArrayData(pairs.map { case (k, v) =>
      InternalRow(UTF8String.fromString(k), UTF8String.fromString(v))
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "png_text"
}

object PngText {

  def apply(bin: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(PngText(eu.expression(bin)))
  }

  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** tEXt (key, value) pairs in file order; null when not a valid PNG
    * chunk stream. */
  private[graft] def parse(b: Array[Byte]): Array[(String, String)] = {
    if (b.length < Sig.length + 12 ||
        !java.util.Arrays.equals(b.take(Sig.length), Sig)) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = Sig.length
    var sawEnd = false
    while (!sawEnd) {
      if (i + 8 > b.length) return null // truncated mid-header
      val len = be32(b, i)
      if (len > Int.MaxValue - 12 || i + 8 + len + 4 > b.length) return null
      val typ = new String(b, i + 4, 4, "US-ASCII")
      if (typ == "tEXt") {
        val data = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len.toInt)
        val z = data.indexOf(0.toByte)
        if (z < 0) return null // keyword unterminated — malformed chunk
        out += ((new String(data, 0, z, "ISO-8859-1"),
          new String(data, z + 1, data.length - z - 1, "ISO-8859-1")))
      }
      if (typ == "IEND") sawEnd = true
      i += 8 + len.toInt + 4
    }
    out.toArray
  }
}
