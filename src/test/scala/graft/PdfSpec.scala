package graft

import org.apache.spark.sql.functions._

import graft.multimodal.PdfText

/** The dependency-free PDF reader (multimodal/PdfText.scala) against the
  * committed fixture: 3 pages exercising uncompressed streams,
  * FlateDecode, Tj/TJ, hex strings, escapes and octal codes. The
  * expected strings are the pinned ground truth the pdf_chunks oracle
  * re-chunks. */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/sample.pdf")
    try in.readAllBytes() finally in.close()
  }

  private val P1 = "Graft is a Spark-native analytics engine. It rewrites reference semantics."
  private val P2 = "Chunking splits text into windows of one hundred characters with twenty overlap."
  private val P3 = "Hex strings and escaped (parens) and octal AB"

  test("fixture pages decode exactly (plain, flate, hex/escaped)") {
    assert(PdfText.extractPages(fixture) == Seq(P1, P2, P3))
  }

  test("extractText appends '\\n' per page like the reference (App.tsx:52)") {
    assert(PdfText.extractText(fixture) == s"$P1\n$P2\n$P3\n")
  }

  test("modern layout: ObjStm-packed page tree behind an xref stream decodes") {
    import graft.multimodal.ModernPdf
    assert(PdfText.extractPages(ModernPdf.bytes) == Seq(ModernPdf.Page1, ModernPdf.Page2))
    assert(PdfText.extractText(ModernPdf.bytes) == ModernPdf.ExpectedText)
  }

  test("stream payloads containing 'endobj'/'endstream' bytes do not truncate the scan") {
    // real Flate output routinely contains these keywords as byte
    // coincidences; the /Length-based cut must survive ANY payload, so
    // plant them literally in an uncompressed stream
    val payload = "BT (survives inner) Tj ET\n% endobj endstream decoy"
    val doc =
      s"""%PDF-1.4
         |1 0 obj
         |<</Type/Catalog/Pages 2 0 R>>
         |endobj
         |2 0 obj
         |<</Type/Pages/Kids[3 0 R]/Count 1>>
         |endobj
         |3 0 obj
         |<</Type/Page/Parent 2 0 R/Contents 4 0 R>>
         |endobj
         |4 0 obj
         |<</Length ${payload.length}>>
         |stream
         |$payload
         |endstream
         |endobj
         |trailer
         |<</Size 5/Root 1 0 R>>
         |%%EOF""".stripMargin
    assert(PdfText.extractPages(doc.getBytes("ISO-8859-1")) == Seq("survives inner"))
  }

  test("garbage, empty and null bytes yield no text, no throw") {
    assert(PdfText.extractPages(Array.empty[Byte]).isEmpty)
    assert(PdfText.extractPages(null).isEmpty)
    assert(PdfText.extractPages("not a pdf at all".getBytes).isEmpty)
    assert(PdfText.extractText("%PDF-1.4 truncated".getBytes) == "")
  }

  test("literal string decoding: nesting, escapes, octal, continuation") {
    assert(PdfText.literalString("(a(b)c)", 0)._1 == "a(b)c")
    assert(PdfText.literalString("""(x\(y\)z)""", 0)._1 == "x(y)z")
    assert(PdfText.literalString("""(\101\102\40ok)""", 0)._1 == "AB ok")
    assert(PdfText.literalString("(tab\\there)", 0)._1 == "tab\there")
  }

  test("hex string decoding, odd-digit padding") {
    assert(PdfText.hexString("<48656C6C6F>", 0)._1 == "Hello")
    assert(PdfText.hexString("<48 65 6C>", 0)._1 == "Hel")
    assert(PdfText.hexString("<5>", 0)._1 == "P") // 0x50
  }

  test("pdf_extract expression: distributed decode via the Column API") {
    val df = Seq((0L, fixture), (1L, Array.empty[Byte]))
      .toDF("doc_id", "content")
      .select(col("doc_id"),
        graft.functions.PdfExtract(col("content")).as("text"))
      .orderBy("doc_id")
    val rows = df.collect()
    assert(rows(0).getString(1) == s"$P1\n$P2\n$P3\n")
    assert(rows(1).getString(1) == "")
  }

  test("gunzip_text: round-trips real gzip, nulls corrupt bytes, SQL-callable") {
    def gzip(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(s.getBytes("UTF-8")); gz.close()
      bos.toByteArray
    }
    val text = "compressed web corpus payload — naïve UTF-8 ✓"
    val df = Seq((0L, gzip(text)), (1L, "not gzip".getBytes), (2L, gzip("")))
      .toDF("id", "payload")
      .select(col("id"), graft.functions.GunzipText(col("payload")).as("text"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getString(1) == text)
    assert(rows(1).isNullAt(1)) // corrupt bytes -> null, not a throw
    assert(rows(2).getString(1) == "")
    GraftExtensions.register(spark)
    Seq(Tuple1(gzip("via sql"))).toDF("p").createOrReplaceTempView("gz")
    assert(spark.sql("SELECT gunzip_text(p) AS t FROM gz").head().getString(0) == "via sql")
  }

  test("pdf_chunks query: chunker output over the fixture is non-empty and aligned") {
    val out = SparkEntry.queries("pdf_chunks")(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) == 0L)
    assert(out.head.getString(1).startsWith("Graft is a Spark-native"))
    // stride 80: positions are multiples of 80 over the full text length
    val full = s"$P1\n$P2\n$P3\n"
    assert(out.map(_.getLong(0)).toSeq == (0L until full.length.toLong by 80L).toSeq)
  }
}
