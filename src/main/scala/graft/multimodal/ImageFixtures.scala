package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Deterministic image-file writers for the multimodal decode path —
  * driver-built literal payloads (the same convention as the PDF and
  * gzip fixtures), so the [[graft.functions.ImageMeta]] oracle can pin
  * expected rows by pure arithmetic without an image library.
  *
  * [[png]] emits a fully VALID file: real IHDR/IDAT/IEND chunks,
  * deflate-compressed scanlines, correct CRC32s — a PNG decoder would
  * accept it. [[jpeg]] and [[gif]] emit structurally valid metadata
  * streams (all headers legal and complete); the JPEG carries no
  * entropy-coded scan, which is exactly the part a metadata pass never
  * reads. */
object ImageFixtures {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(data.length.toLong))
    val t = typ.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    out.write(be32(crc.getValue))
    out.toByteArray
  }

  /** Valid truecolor (RGB, 8-bit) PNG of the given dimensions with a
    * deterministic `(x + y) % 256` pixel ramp. */
  def png(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(width.toLong)); ihdr.write(be32(height.toLong))
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive, no interlace
    // scanlines: filter byte 0 + RGB ramp, deflate-compressed
    val raw = new Array[Byte](height * (1 + width * 3))
    var p = 0
    var y = 0
    while (y < height) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < width * 3) { raw(p) = ((x / 3 + y) % 256).toByte; p += 1; x += 1 }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val idat = java.util.Arrays.copyOf(buf, d.deflate(buf))
    d.end()
    val out = new ByteArrayOutputStream()
    out.write(sig)
    out.write(pngChunk("IHDR", ihdr.toByteArray))
    out.write(pngChunk("IDAT", idat))
    out.write(pngChunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** [[png]] with `tEXt` metadata chunks inserted between IHDR and
    * IDAT (ISO 15948 §11.3.3: `keyword | 0x00 | text`, Latin-1) — the
    * caption-bearing-image fixture for [[graft.functions.PngText]].
    * Still a fully valid PNG (correct per-chunk CRCs). */
  def pngWithText(width: Int, height: Int,
                  texts: Seq[(String, String)]): Array[Byte] = {
    val base = png(width, height)
    // split after signature(8) + IHDR chunk (8 + 13 + 4 bytes)
    val cut = 8 + 12 + 13
    val out = new ByteArrayOutputStream()
    out.write(base, 0, cut)
    texts.foreach { case (k, v) =>
      out.write(pngChunk("tEXt",
        k.getBytes("ISO-8859-1") ++ Array(0.toByte) ++ v.getBytes("ISO-8859-1")))
    }
    out.write(base, cut, base.length - cut)
    out.toByteArray
  }

  /** Metadata-complete JPEG stream: SOI, APP0/JFIF, a SOF frame header
    * (baseline C0 by default; pass 0xC2 for progressive), EOI. */
  def jpeg(width: Int, height: Int, precision: Int = 8, sof: Int = 0xc0): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    out.write(be16(16))
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)       // version 1.1
    out.write(0)                     // aspect-ratio units
    out.write(be16(1)); out.write(be16(1))
    out.write(0); out.write(0)       // no thumbnail
    out.write(0xff); out.write(sof)  // SOF: 3-component frame header
    out.write(be16(8 + 3 * 3))
    out.write(precision)
    out.write(be16(height)); out.write(be16(width))
    out.write(3)
    for (c <- 1 to 3) { out.write(c); out.write(0x11); out.write(0) }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** GIF89a logical screen descriptor (8 bits/pixel global table) +
    * global color table + trailer. */
  def gif(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0xf7) // global table, 8 bpp, size field 7 → 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    out.write(new Array[Byte](256 * 3)) // global color table
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
