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

  /** DECODABLE baseline JPEG with EXACT pixel arithmetic — the frame
    * payload for the MJPEG video path: 3-component YCbCr, no
    * subsampling, quantization tables all 1, every 8×8 block DC-ONLY
    * with Y-coefficient `8·(v−128)` for the block's target value `v`
    * and Cb=Cr=128 (chroma coefficients 0).
    *
    * Why this decodes EXACTLY (so an arithmetic oracle can pin pixel
    * stats through a lossy-by-reputation codec): a DC-only block
    * shortcuts the IDCT to `((dc·q + 4) >> 3) + 128` per sample —
    * with q=1 and dc=8·(v−128) that is exactly `v` for every v in
    * 0..255 — and the YCbCr→RGB conversion with zero chroma deltas is
    * the identity, so every decoded channel equals the block's Y
    * value bit-for-bit. Huffman side: Annex K luminance DC table plus
    * a minimal 1-symbol AC table (EOB only), canonical codes, 0xFF
    * byte-stuffing, 1-padding — a fully standard baseline stream any
    * decoder accepts.
    *
    * `blockValue(bx, by)` gives each 8×8 block's gray value (0..255);
    * width/height must be multiples of 8 (whole MCUs — no edge
    * replication to reason about). */
  def jpegDecodable(width: Int, height: Int,
                    blockValue: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "whole 8x8 blocks only")
    // canonical Huffman codes from (BITS, HUFFVAL)
    def canonical(bits: Seq[Int], vals: Seq[Int]): Map[Int, (Int, Int)] = {
      var code = 0
      var vi = 0
      val out = Map.newBuilder[Int, (Int, Int)]
      (1 to 16).foreach { len =>
        (0 until bits(len - 1)).foreach { _ =>
          out += vals(vi) -> (code, len); vi += 1; code += 1
        }
        code <<= 1
      }
      out.result()
    }
    val dcBits = Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = 0 to 11
    val acBits = Seq(1) ++ Seq.fill(15)(0)
    val acVals = Seq(0x00) // EOB only
    val dcCodes = canonical(dcBits, dcVals.toSeq)
    val acCodes = canonical(acBits, acVals)
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb) // DQT: table 0, all 1s
    out.write(be16(2 + 1 + 64)); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    marker(0xc0) // SOF0: 3 components, 1x1 sampling, quant table 0
    out.write(be16(8 + 3 * 3)); out.write(8)
    out.write(be16(height)); out.write(be16(width)); out.write(3)
    for (c <- 1 to 3) { out.write(c); out.write(0x11); out.write(0) }
    marker(0xc4) // DHT: DC table 0
    out.write(be16(2 + 1 + 16 + dcVals.size)); out.write(0x00)
    dcBits.foreach(out.write); dcVals.foreach(out.write)
    marker(0xc4) // DHT: AC table 0
    out.write(be16(2 + 1 + 16 + acVals.size)); out.write(0x10)
    acBits.foreach(out.write); acVals.foreach(out.write)
    marker(0xda) // SOS
    out.write(be16(6 + 2 * 3)); out.write(3)
    for (c <- 1 to 3) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    // entropy-coded data: per MCU (= one block per component at 1x1),
    // each component's DC diff + EOB; 0xFF bytes stuffed with 0x00
    var cur = 0
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00)
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    def category(d: Int): Int = {
      var s = 0; var a = math.abs(d)
      while (a > 0) { s += 1; a >>= 1 }
      s
    }
    def putDc(diff: Int): Unit = {
      val s = category(diff)
      val (code, len) = dcCodes(s)
      putBits(code, len)
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    def putEob(): Unit = { val (c, l) = acCodes(0x00); putBits(c, l) }
    val (bw, bh) = (width / 8, height / 8)
    var prevY = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = blockValue(bx, by)
        require(v >= 0 && v <= 255, s"block value out of range: $v")
        val dc = 8 * (v - 128)
        putDc(dc - prevY); prevY = dc
        putEob()
        putDc(0); putEob() // Cb: constant 128 (predictor stays 0)
        putDc(0); putEob() // Cr
        bx += 1
      }
      by += 1
    }
    if (nbits > 0) { // pad the last byte with 1s
      cur = (cur << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(cur)
      if (cur == 0xff) out.write(0x00)
    }
    marker(0xd9) // EOI
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
