package graft.multimodal

import java.util.zip.Inflater

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Minimal, dependency-free PDF text extraction.
  *
  * The reference's first operator is pdf.js text extraction
  * (`/root/reference/App.tsx:46-54`: per page,
  * `getTextContent().items.map(i => i.str).join(' ')`, each page
  * followed by `'\n'`). No PDF library resolves from this project's
  * offline dependency set (pdfbox et al. are absent from the sbt/
  * coursier caches; the build forbids new deps), so this is a from-
  * scratch reader of the public PDF 1.x format (ISO 32000) covering
  * the text-bearing core:
  *
  *  - body object scan (`N 0 obj … endobj`), robust to stale xref;
  *  - page tree walk: trailer `/Root` → catalog `/Pages` → `/Kids`
  *    (recursive), falling back to `/Type /Page` objects in object
  *    order when the tree is unparseable;
  *  - per-page `/Contents` (single ref or array), stream payloads cut
  *    between `stream`/`endstream`, `/FlateDecode` inflated with the
  *    JDK's zlib ([[java.util.zip.Inflater]]);
  *  - content-stream text operators `Tj`, `'`, `"`, `TJ` with literal
  *    `(…)` strings (escapes, nested parens, octal) and `<…>` hex
  *    strings; each shown string is one text item.
  *
  *  - modern (PDF 1.5+) file structure: objects packed into compressed
  *    object streams (`/Type /ObjStm`) are inflated and merged into the
  *    object table, and cross-reference streams need no special-casing —
  *    the reader locates objects by scanning, not via xref, and the
  *    trailer keys (`/Root`) live in the xref stream's PLAIN-TEXT dict.
  *    Stream payloads are cut by `/Length` when it is a direct integer
  *    (validated against a following `endstream`), so compressed binary
  *    that happens to contain `endobj`/`endstream` bytes cannot truncate
  *    the scan.
  *
  * Out of scope (documented limits, like the stubbed media codecs):
  * encrypted files, CMap/Type0 composite-font decoding (bytes are read
  * as Latin-1 — exact for the standard fonts), and PNG predictors on
  * `DecodeParms` (predictors appear on xref-stream DATA, which this
  * reader never needs to decode). Real ingest at 100 TB runs this per
  * document inside a scan — the operator shape (binary column in,
  * string out, no driver round-trip) is what scales.
  */
object PdfText {

  /** Extracted text of each page: text items joined with `' '`, in
    * content-stream order (the pdf.js `getTextContent` convention the
    * reference relies on). Unparseable input yields no pages. */
  def extractPages(bytes: Array[Byte]): Seq[String] = {
    if (bytes == null || bytes.length < 5) return Nil
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!raw.startsWith("%PDF")) return Nil
    val objs = expandObjectStreams(parseObjects(raw))
    pageObjects(raw, objs).map { dict =>
      contentStreams(dict, objs).map(textItems).flatten match {
        case Nil => ""
        case items => items.mkString(" ")
      }
    }
  }

  /** The reference's whole-document form: every page's text followed by
    * `'\n'` (`App.tsx:52` appends the newline per page, last included). */
  def extractText(bytes: Array[Byte]): String =
    extractPages(bytes).map(_ + "\n").mkString

  // ------------------------------------------------------------- objects

  private val ObjStartRe = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+obj""")
  private val DirectLenRe: Regex = """/Length\s+(\d+)(?!\s+\d+\s+R)""".r

  /** Object number → body (dict + optional stream), by sequential scan.
    *
    * A naive `obj(.*?)endobj` regex truncates any object whose
    * compressed stream happens to contain the bytes `endobj` — routine
    * in real Flate output. This scanner instead cuts each stream payload
    * by its `/Length` when that is a direct integer (validated by
    * checking `endstream` actually follows), falling back to the nearest
    * `endstream` for indirect lengths, and resumes the object scan AFTER
    * the payload — binary content can never fabricate or truncate
    * objects. */
  private def parseObjects(raw: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    val m = ObjStartRe.matcher(raw)
    var pos = 0
    while (pos < raw.length && m.find(pos)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val endobjIdx = raw.indexOf("endobj", bodyStart)
      val streamIdx = raw.indexOf("stream", bodyStart)
      val hasStream = streamIdx >= 0 && (endobjIdx < 0 || streamIdx < endobjIdx)
      val end =
        if (!hasStream) { if (endobjIdx < 0) raw.length else endobjIdx }
        else {
          var ps = streamIdx + "stream".length
          if (ps < raw.length && raw.charAt(ps) == '\r') ps += 1
          if (ps < raw.length && raw.charAt(ps) == '\n') ps += 1
          val dict = raw.substring(bodyStart, streamIdx)
          val byLen = DirectLenRe.findFirstMatchIn(dict).map(_.group(1).toInt)
            .map(ps + _)
            // trust /Length only when `endstream` really follows it
            .filter(pe => pe <= raw.length &&
              raw.indexOf("endstream", pe) >= 0 &&
              raw.substring(pe, math.min(pe + 16, raw.length))
                .dropWhile(c => c == '\r' || c == '\n' || c == ' ')
                .startsWith("endstream"))
          val payloadEnd = byLen.getOrElse(raw.indexOf("endstream", ps))
          if (payloadEnd < 0) raw.length
          else {
            val eo = raw.indexOf("endobj", payloadEnd)
            if (eo < 0) raw.length else eo
          }
        }
      out += num -> raw.substring(bodyStart, end)
      pos = math.max(end, bodyStart)
    }
    out.result()
  }

  /** Merge objects packed inside `/Type /ObjStm` compressed object
    * streams (PDF 1.5+) into the object table. The decoded stream is
    * `N` whitespace-separated (objnum, offset) pairs followed by the
    * object bodies at `/First` + offset; packed objects are dicts only
    * (the spec forbids streams inside ObjStm), so the bodies merge
    * directly. Packed copies override scan copies: in an incrementally
    * updated file the ObjStm version is the newer one. */
  private def expandObjectStreams(objs: Map[Int, String]): Map[Int, String] = {
    val packed = objs.values.toSeq.flatMap { body =>
      if ("""/Type\s*/ObjStm""".r.findFirstIn(body).isEmpty) Nil
      else streamPayload(body).toSeq.flatMap { content =>
        val n = """/N\s+(\d+)""".r.findFirstMatchIn(body)
          .map(_.group(1).toInt).getOrElse(0)
        val first = """/First\s+(\d+)""".r.findFirstMatchIn(body)
          .map(_.group(1).toInt).getOrElse(0)
        val header = content.substring(0, math.min(first, content.length))
        val pairs = """\d+""".r.findAllIn(header).map(_.toInt)
          .grouped(2).collect { case Seq(a, b) => (a, b) }.take(n).toSeq
        pairs.zipWithIndex.map { case ((num, off), i) =>
          val start = math.min(first + off, content.length)
          val stop =
            if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, content.length)
            else content.length
          num -> content.substring(start, stop)
        }
      }
    }
    objs ++ packed
  }

  private def ref(body: String, key: String): Option[Int] =
    (key + """\s+(\d+)\s+\d+\s+R""").r.findFirstMatchIn(body).map(_.group(1).toInt)

  private def refArray(body: String, key: String): Seq[Int] =
    (key + """\s*\[([^\]]*)\]""").r.findFirstMatchIn(body) match {
      case Some(m) =>
        """(\d+)\s+\d+\s+R""".r.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
      case None => Nil
    }

  /** Page dict bodies in reading order: walk Root→Pages→Kids; fall back
    * to all `/Type /Page` objects in object-number order. */
  private def pageObjects(raw: String, objs: Map[Int, String]): Seq[String] = {
    def walk(num: Int, depth: Int): Seq[String] = objs.get(num) match {
      case Some(body) if depth < 32 =>
        if (body.contains("/Type") && """/Type\s*/Pages""".r.findFirstIn(body).isDefined)
          refArray(body, "/Kids").flatMap(walk(_, depth + 1))
        else if ("""/Type\s*/Page[^s]""".r.findFirstIn(body + " ").isDefined) Seq(body)
        else Nil
      case _ => Nil
    }
    val viaTree = for {
      root <- """/Root\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(raw).map(_.group(1).toInt)
      cat <- objs.get(root)
      pagesRoot <- ref(cat, "/Pages")
    } yield walk(pagesRoot, 0)
    viaTree.filter(_.nonEmpty).getOrElse {
      objs.toSeq.sortBy(_._1).collect {
        case (_, body) if """/Type\s*/Page[^s]""".r.findFirstIn(body + " ").isDefined => body
      }
    }
  }

  /** Decoded content-stream bytes for a page: `/Contents` ref(s), each
    * stream cut between `stream`/`endstream`, flate-inflated if marked. */
  private def contentStreams(pageBody: String, objs: Map[Int, String]): Seq[String] = {
    val refs = refArray(pageBody, "/Contents") match {
      case Nil => ref(pageBody, "/Contents").toSeq
      case rs => rs
    }
    refs.flatMap(objs.get).flatMap(streamPayload)
  }

  /** Decoded stream payload of an object body: bytes between `stream`
    * and the trailing `endstream`, flate-inflated if marked. */
  private def streamPayload(body: String): Option[String] = {
    val start = body.indexOf("stream")
    val end = body.lastIndexOf("endstream")
    if (start < 0 || end <= start) None
    else {
      val payload = body.substring(start + "stream".length, end)
        .dropWhile(c => c == '\r' || c == '\n')
        .stripSuffix("\n").stripSuffix("\r")
      val bytes = payload.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      if ("""/Filter\s*/FlateDecode""".r.findFirstIn(body.substring(0, start)).isDefined)
        inflate(bytes)
      else Some(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
    }
  }

  private def inflate(data: Array[Byte]): Option[String] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stalled/corrupt
      }
      Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1))
    } catch { case _: Exception => None }
    finally inf.end()
  }

  // ------------------------------------------------------- content parse

  /** Shown-text items of one content stream, in operator order. */
  private[graft] def textItems(content: String): Seq[String] = {
    val items = ArrayBuffer.empty[String]
    // operand stack of decoded strings since the last operator; arrays
    // for TJ are tracked by nesting depth
    var pendingStrings = ArrayBuffer.empty[String]
    var arrayStrings = ArrayBuffer.empty[String]
    var inArray = false
    var i = 0
    val n = content.length
    while (i < n) {
      val c = content.charAt(i)
      c match {
        case '(' =>
          val (s, next) = literalString(content, i)
          (if (inArray) arrayStrings else pendingStrings) += s
          i = next
        case '<' if i + 1 < n && content.charAt(i + 1) != '<' =>
          val (s, next) = hexString(content, i)
          (if (inArray) arrayStrings else pendingStrings) += s
          i = next
        case '[' => inArray = true; arrayStrings = ArrayBuffer.empty[String]; i += 1
        case ']' => inArray = false; i += 1
        case '\'' | '"' =>
          items ++= pendingStrings; pendingStrings = ArrayBuffer.empty[String]; i += 1
        case _ if c.isLetter =>
          val start = i
          while (i < n && (content.charAt(i).isLetter || content.charAt(i) == '*')) i += 1
          content.substring(start, i) match {
            case "Tj" =>
              items ++= pendingStrings.lastOption
              pendingStrings = ArrayBuffer.empty[String]
            case "TJ" =>
              items += arrayStrings.mkString // kerning numbers ignored
              arrayStrings = ArrayBuffer.empty[String]
              pendingStrings = ArrayBuffer.empty[String]
            case "BT" | "ET" =>
              pendingStrings = ArrayBuffer.empty[String]
            case _ => () // positioning/state ops: operands irrelevant here
          }
        case _ => i += 1
      }
    }
    items.toSeq
  }

  /** Decode a `(…)` literal string starting at `start`; returns (text,
    * index after the closing paren). Handles nesting, `\` escapes and
    * octal codes (ISO 32000 §7.3.4.2). */
  private[graft] def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case '(' => sb += '('; i += 2
            case ')' => sb += ')'; i += 2
            case '\\' => sb += '\\'; i += 2
            case d if d >= '0' && d <= '7' =>
              var code = 0; var k = 0; i += 1
              while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                code = code * 8 + (s.charAt(i) - '0'); i += 1; k += 1
              }
              sb += code.toChar
            case '\n' => i += 2 // line continuation
            case other => sb += other; i += 2
          }
        case '(' => depth += 1; sb += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb += ')'
          i += 1
        case ch => sb += ch; i += 1
      }
    }
    (sb.toString, i)
  }

  /** Decode a `<…>` hex string starting at `start` (one byte per hex
    * pair, odd final digit padded with 0). */
  private[graft] def hexString(s: String, start: Int): (String, Int) = {
    val end0 = s.indexOf('>', start + 1)
    val end = if (end0 < 0) s.length else end0
    val hex = s.substring(start + 1, end).filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < padded.length + 1 && i + 2 <= padded.length) {
      sb += Integer.parseInt(padded.substring(i, i + 2), 16).toChar
      i += 2
    }
    (sb.toString, math.min(end + 1, s.length))
  }
}
