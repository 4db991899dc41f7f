package graft.multimodal

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic PDF 1.5 fixture with the MODERN file structure: the
  * catalog and page dicts packed into a compressed object stream
  * (`/Type /ObjStm`) and a cross-reference STREAM (`/Type /XRef`,
  * `W [1 2 2]`) instead of the classic `xref` table — the layout
  * virtually every post-2005 writer emits, and the reference reads via
  * pdf.js (`/root/reference/App.tsx:46-54` renders anything the browser
  * can). Generated in code (a minimal PDF writer) rather than committed
  * as a binary blob, so the structure under test is reviewable; the
  * extraction ground truth is pinned in PdfSpec and the
  * pdf_modern_chunks oracle.
  *
  * Layout: objs 1–4 (catalog, pages, 2 page dicts) live in ObjStm obj 7;
  * objs 5–6 are FlateDecoded content streams (Tj and TJ-array forms);
  * obj 8 is the xref stream whose plain-text dict carries `/Root`.
  */
object ModernPdf {

  val Page1 =
    "Modern PDFs pack their catalog and page dictionaries into compressed object streams."
  private val Page2Parts = Seq(
    "Cross reference streams replace ",
    "the classic xref table ",
    "in files written after 2005.")
  val Page2: String = Page2Parts.mkString

  /** The whole-document extraction the reader must produce. */
  val ExpectedText: String = s"$Page1\n$Page2\n"

  private def flate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length)
      val buf = new Array[Byte](8192)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      out.toByteArray
    } finally d.end()
  }

  def bytes: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def streamObj(num: Int, extraDict: String, payload: Array[Byte]): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n<<$extraDict/Filter/FlateDecode/Length ${payload.length}>>\nstream\n")
      out.write(payload, 0, payload.length)
      w("\nendstream\nendobj\n")
    }
    w("%PDF-1.5\n")
    streamObj(5, "", flate(s"BT /F1 12 Tf ($Page1) Tj ET".getBytes(ISO_8859_1)))
    streamObj(6, "", flate(
      ("BT /F1 12 Tf [" + Page2Parts.map("(" + _ + ")").mkString(" ") + "] TJ ET")
        .getBytes(ISO_8859_1)))
    // ---- ObjStm: header of (objnum, offset) pairs, then the dict bodies
    val packed = Seq(
      1 -> "<</Type/Catalog/Pages 2 0 R>>",
      2 -> "<</Type/Pages/Kids[3 0 R 4 0 R]/Count 2>>",
      3 -> "<</Type/Page/Parent 2 0 R/Contents 5 0 R>>",
      4 -> "<</Type/Page/Parent 2 0 R/Contents 6 0 R>>")
    val offs = packed.map(_._2).scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = packed.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val content = header + packed.map(_._2).mkString("\n")
    streamObj(7, s"/Type/ObjStm/N ${packed.size}/First ${header.length}",
      flate(content.getBytes(ISO_8859_1)))
    // ---- xref stream: type/field2/field3 rows, W [1 2 2]
    offsets(8) = out.size()
    val entries: Seq[(Int, Int, Int)] =
      Seq((0, 0, 0)) ++                    // obj 0: free list head
        (1 to 4).map(i => (2, 7, i - 1)) ++ // packed in ObjStm 7, index i-1
        (5 to 8).map(i => (1, offsets(i), 0)) // direct objects at offset
    val xrefData = new java.io.ByteArrayOutputStream()
    entries.foreach { case (t, a, b) =>
      xrefData.write(t)
      xrefData.write((a >> 8) & 0xFF); xrefData.write(a & 0xFF)
      xrefData.write((b >> 8) & 0xFF); xrefData.write(b & 0xFF)
    }
    val xp = flate(xrefData.toByteArray)
    w(s"8 0 obj\n<</Type/XRef/Size 9/Root 1 0 R/W[1 2 2]" +
      s"/Filter/FlateDecode/Length ${xp.length}>>\nstream\n")
    out.write(xp, 0, xp.length)
    w("\nendstream\nendobj\n")
    w(s"startxref\n${offsets(8)}\n%%EOF\n")
    out.toByteArray
  }
}
