package graft.kernels

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Minimal PDF page splitting — the reference's
  * `SerializerPdfDoc.load/split` (dd_core/dataflow/custom_serialize
  * .py:674) walks a document and emits one datapoint per page via
  * `pdf_utils.PDFStreamer` (dd_core/utils/pdf_utils.py:406).
  *
  * This sandbox has no PDF library, so the parser is built from the
  * public PDF spec with the JDK only: it scans the byte stream for
  * `N G obj … endobj` objects (skipping stream payloads while
  * scanning, honoring `/Length` — direct, or indirect via an
  * integer-object pre-pass — so binary bytes can't fake object
  * boundaries), identifies page objects (`/Type /Page`, not
  * `/Pages`), resolves their `/Contents N G R` reference (single or
  * array), and extracts text from the content streams (`(…) Tj` and
  * `[…] TJ` show-text operators, with PDF string escapes).
  * `/FlateDecode` streams — the common case in real-world PDFs — are
  * inflated with `java.util.zip.Inflater` (FlateDecode IS zlib,
  * ISO 32000-1 §7.4.4) before text extraction; ASCII85/ASCIIHex
  * transport filters decode too, including `[/ASCII85Decode
  * /FlateDecode]` chains, and `/Type /ObjStm` object streams
  * (PDF ≥1.5 — where modern writers put the page dicts) are expanded
  * into the object list. Honest residual gaps: predictor-coded Flate
  * (`/DecodeParms`/`/Predictor`, used for xref and image data, not
  * content streams), LZW/DCT/JBIG2 filters, and encrypted documents
  * all yield pages with empty text rather than garbage — the page
  * COUNT and per-page split still work.
  */
object Pdf {

  final case class PdfPage(pageNo: Int, objOffset: Long, text: String)

  /** One indirect object: number, byte offset, dict/body text (before
    * any stream keyword), and the raw (still-encoded) stream payload.
    */
  final case class PdfObj(num: Int, off: Int, dict: String, stream: Option[Array[Byte]])

  private val HeaderRe = """(\d+)\s+(\d+)\s+obj""".r.pattern
  private val ContentsRefRe = """/Contents\s+(\d+)\s+(\d+)\s+R""".r
  private val ContentsArrRe = """(?s)/Contents\s*\[(.*?)\]""".r
  private val RefRe = """(\d+)\s+(\d+)\s+R""".r
  // a direct /Length (an indirect `/Length N G R` resolves via the
  // integer-object pre-pass, else falls to the endstream scan).
  // (?!\d) pins the full number so (\d+) can't backtrack to a prefix
  // that sneaks past the indirect-ref lookahead
  private val LengthRe = """/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)""".r
  private val LengthRefRe = """/Length\s+(\d+)\s+\d+\s+R""".r
  // a whole object that is just an integer (how writers emit stream
  // lengths they only know after writing): `12 0 obj 4096 endobj`
  private val IntObjRe = """(\d+)\s+\d+\s+obj\s*(\d+)\s*endobj""".r

  /** Sequential object scan. Latin-1 decode is byte-preserving, so
    * offsets/regex stay exact and stream payloads round-trip through
    * `.getBytes(ISO_8859_1)`. Stream payloads are SKIPPED while
    * looking for `endobj`: deflate output is arbitrary binary that can
    * contain `endobj`/`N G obj` byte runs, so a flat regex over the
    * file (the round-2 design) could truncate or invent objects.
    */
  def scanObjects(bytes: Array[Byte]): Vector[PdfObj] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    // pre-pass: integer-valued objects, so an INDIRECT `/Length N G R`
    // can still slice its stream exactly (the endstream fallback can be
    // fooled by binary payloads containing the 'endstream' bytes —
    // deflate stored blocks make that craftable). The pattern is
    // specific enough (obj <digits> endobj) that binary false positives
    // would need those exact bytes in sequence; worst case it resolves
    // a wrong length and the <= s.length guard falls back to the scan.
    val intObjs: Map[Int, Long] = IntObjRe.findAllMatchIn(s).flatMap { m =>
      // toLong-safe: both groups are bounded digit runs, but the VALUE
      // may exceed Long on adversarial input — skip those
      scala.util.Try(m.group(1).toInt -> m.group(2).toLong).toOption
    }.toMap
    val out = Vector.newBuilder[PdfObj]
    val m = HeaderRe.matcher(s)
    var p = 0
    var go = p < s.length && m.find(p)
    while (go) {
      val num = m.group(1).toInt
      val off = m.start
      val bodyStart = m.end
      val endobj0 = s.indexOf("endobj", bodyStart)
      // first "stream" occurrence is the keyword when present ("endstream"
      // can only appear after it); it must belong to THIS object
      val streamKw = s.indexOf("stream", bodyStart)
      if (endobj0 < 0) go = false
      else if (streamKw < 0 || streamKw > endobj0) {
        out += PdfObj(num, off, s.substring(bodyStart, endobj0), None)
        go = m.find(endobj0 + 6)
      } else {
        val dict = s.substring(bodyStart, streamKw)
        // spec: the stream keyword is followed by CRLF or LF (not bare CR)
        var dataStart = streamKw + 6
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        // toLong + Try: a corrupt `/Length 99999999999999999999` must
        // degrade to the fallback scan, not throw out of the job
        val declaredLen: Option[Long] =
          LengthRe.findFirstMatchIn(dict)
            .flatMap(lm => scala.util.Try(lm.group(1).toLong).toOption)
            .orElse(LengthRefRe.findFirstMatchIn(dict).flatMap(lm =>
              scala.util.Try(lm.group(1).toInt).toOption.flatMap(intObjs.get)))
        val dataEnd = declaredLen match {
          case Some(len) if len >= 0 && dataStart + len <= s.length =>
            (dataStart + len).toInt
          case _ =>
            // no resolvable /Length: scan for endstream. Deliberately
            // do NOT strip the preceding EOL — whether a trailing
            // \r/\n byte is the separator or the last DATA byte is
            // ambiguous without a length (stripping once truncated a
            // deflate stream whose final byte was 0x0d), and both
            // consumers tolerate the extra byte: Inflater stops at the
            // deflate stream end, extractText ignores whitespace.
            val es = s.indexOf("endstream", dataStart)
            if (es < 0) dataStart else es
        }
        val data = s.substring(dataStart, dataEnd).getBytes(StandardCharsets.ISO_8859_1)
        val endobj = s.indexOf("endobj", math.max(dataEnd, dataStart))
        out += PdfObj(num, off, dict, Some(data))
        if (endobj < 0) go = false else go = m.find(endobj + 6)
      }
    }
    out.result()
  }

  /** Inflate a zlib (FlateDecode) payload; None for truncated,
    * corrupt, or preset-dictionary streams (strict — garbage text is
    * worse than the documented empty page).
    */
  def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        n = inf.inflate(buf)
      }
      // n == 0 means finished, truncated (needsInput), or needsDictionary
      if (inf.finished()) Some(out.toByteArray) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** ASCII85 decode (ISO 32000-1 §7.4.3): groups of 5 chars '!'..'u'
    * → 4 bytes base 85, 'z' = four zero bytes, whitespace ignored,
    * `~>` terminates, partial final group keeps n−1 bytes. None on any
    * malformed input (strict, like [[inflate]]).
    */
  def ascii85(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var g = 0
    var i = 0
    var done = false
    def flush(n: Int): Boolean = {
      if (n < 2) return n == 0
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < n) group(k) else 84); k += 1 }
      if (v > 0xffffffffL) return false
      var b = 0
      while (b < n - 1) { out.write(((v >>> (24 - 8 * b)) & 0xff).toInt); b += 1 }
      true
    }
    while (i < data.length && !done) {
      val c = data(i).toInt & 0xff
      if (c == '~') done = true // `~>` terminator
      else if (c == 'z' && g == 0) out.write(Array[Byte](0, 0, 0, 0))
      else if (c >= '!' && c <= 'u') {
        group(g) = c - '!'
        g += 1
        if (g == 5) { if (!flush(5)) return None; g = 0 }
      } else if (!Character.isWhitespace(c)) return None
      i += 1
    }
    if (flush(g)) Some(out.toByteArray) else None
  }

  /** ASCIIHex decode (§7.4.2): hex pairs, whitespace ignored, `>`
    * terminates, odd final digit padded with 0.
    */
  def asciiHex(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toInt & 0xff
      if (c == '>') done = true
      else if (!Character.isWhitespace(c)) {
        val d = Character.digit(c, 16)
        if (d < 0) return None
        if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi * 16)
    Some(out.toByteArray)
  }

  // filter names in application order: `/Filter /Name` or
  // `/Filter [/A /B]` (§7.3.8: array = filters applied in sequence)
  private val FilterClauseRe = """(?s)/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)""".r
  private val NameRe = """/([A-Za-z0-9]+)""".r

  private def filtersOf(dict: String): Seq[String] =
    FilterClauseRe.findFirstMatchIn(dict)
      .map(m => NameRe.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      .getOrElse(Nil)

  /** Decode a stream payload through its (possibly chained) filters:
    * Flate / ASCII85 / ASCIIHex supported; None (documented skip) for
    * predictor-coded Flate and every other filter (LZW, DCT, …).
    */
  def decodeStream(dict: String, data: Array[Byte]): Option[Array[Byte]] =
    if (dict.contains("/Predictor")) None
    else filtersOf(dict).foldLeft(Option(data)) { (acc, f) =>
      acc.flatMap(d => f match {
        case "FlateDecode" | "Fl" => inflate(d)
        case "ASCII85Decode" | "A85" => ascii85(d)
        case "ASCIIHexDecode" | "AHx" => asciiHex(d)
        case _ => None
      })
    }

  private def decodeContent(dict: String, data: Array[Byte]): Option[String] =
    decodeStream(dict, data).map(new String(_, StandardCharsets.ISO_8859_1))

  /** Expand `/Type /ObjStm` object streams (PDF ≥1.5, §7.5.7): modern
    * writers store most non-stream objects — including PAGE dicts —
    * inside a compressed container stream, so a parser without this
    * sees zero pages on current-generation PDFs. Layout: `/N` pairs of
    * `objnum offset` ints, then the serialized objects starting at
    * `/First` (offsets relative to it). Contained objects carry no
    * obj/endobj wrappers and may not contain streams, so they merge
    * into the object list as dict-only [[PdfObj]]s (container's byte
    * offset, preserving document order).
    */
  private val IntPairHeaderRe = """\s*(\d+)\s+(\d+)""".r
  def expandObjectStreams(objs: Vector[PdfObj]): Vector[PdfObj] =
    objs.flatMap { o =>
      if (!(o.dict.contains("/ObjStm") && o.stream.isDefined)) Vector(o)
      else {
        val expanded = for {
          content <- decodeStream(o.dict, o.stream.get)
          n <- """/N\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
          first <- """/First\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
        } yield {
          val s = new String(content, StandardCharsets.ISO_8859_1)
          val header = s.take(math.min(first, s.length))
          val pairs = IntPairHeaderRe.findAllMatchIn(header)
            .map(m => (m.group(1).toInt, m.group(2).toInt)).take(n).toVector
          pairs.zipWithIndex.map { case ((num, off), i) =>
            val start = math.min(first + off, s.length)
            val end =
              if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, s.length)
              else s.length
            PdfObj(num, o.off, s.substring(start, end), None)
          }
        }
        // undecodable container (unknown filter / corrupt): keep the
        // raw object so the page count degrades, never throws
        expanded.getOrElse(Vector(o))
      }
    }

  /** Split a PDF byte array into pages (1-based page numbers, in
    * document object order — the order `/Kids` arrays list them for
    * the linear writers this subset targets).
    */
  def splitPages(bytes: Array[Byte]): Seq[PdfPage] = {
    val objects = expandObjectStreams(scanObjects(bytes))
    val byNum = objects.map(o => o.num -> o).toMap
    def contentText(o: PdfObj): String =
      o.stream.flatMap(decodeContent(o.dict, _)).map(extractText).getOrElse("")
    val pages = ArrayBuffer.empty[PdfPage]
    var pageNo = 0
    for (o <- objects) {
      val body = o.dict
      val isPage = body.contains("/Type /Page") && !body.contains("/Type /Pages") ||
        body.contains("/Type/Page") && !body.contains("/Type/Pages")
      if (isPage) {
        pageNo += 1
        val refs: Seq[Int] = ContentsArrRe.findFirstMatchIn(body) match {
          case Some(arr) => RefRe.findAllMatchIn(arr.group(1)).map(_.group(1).toInt).toSeq
          case None => ContentsRefRe.findFirstMatchIn(body).map(_.group(1).toInt).toSeq
        }
        val text =
          if (refs.nonEmpty)
            // multiple content streams concatenate (spec: treated as one
            // stream with whitespace between), non-empty parts joined
            refs.flatMap(byNum.get).map(contentText).filter(_.nonEmpty).mkString(" ")
          else
            // inline content stream inside the page object
            contentText(o)
        pages += PdfPage(pageNo, o.off.toLong, text)
      }
    }
    pages.toSeq
  }

  /** Text of the `(…) Tj` / `[(…) -10 (…)] TJ` / `'` / `"` show-text
    * operators of a decoded content stream, whitespace-joined,
    * with PDF string escapes (\\, \(, \), \n, \t, octal) decoded.
    *
    * Content streams are postfix: operands accumulate on a stack until
    * an operator consumes them. This scanner keeps the PENDING string
    * operands (numbers/names/brackets are skipped) and, at each
    * operator word, emits them if the operator is a show-text op and
    * discards them otherwise — so every string of a multi-string
    * `[…] TJ` array is kept (the round-2 first cut only kept the last
    * one: the lookahead from an inner string stopped at the next '(').
    */
  def extractText(stream: String): String = {
    val out = new StringBuilder
    val pending = scala.collection.mutable.ArrayBuffer.empty[String]
    def emit(): Unit = {
      for (s <- pending) {
        if (out.nonEmpty) out.append(' ')
        out.append(s)
      }
      pending.clear()
    }
    var i = 0
    val n = stream.length
    while (i < n) {
      val c = stream.charAt(i)
      if (c == '(') {
        val sb = new StringBuilder
        i += 1
        var depth = 1
        while (i < n && depth > 0) {
          val ch = stream.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val e = stream.charAt(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case '(' | ')' | '\\' => sb.append(e); i += 2
              case d if d >= '0' && d <= '7' =>
                var j = i + 1
                var v = 0
                while (j < n && j < i + 4 && stream.charAt(j) >= '0' && stream.charAt(j) <= '7') {
                  v = v * 8 + (stream.charAt(j) - '0'); j += 1
                }
                sb.append(v.toChar); i = j
              case _ => sb.append(e); i += 2
            }
          } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        pending += sb.toString
      } else if (c == '<') {
        // hex string <4A6F> (or dict open <<): consume wholesale so its
        // hex letters can't parse as operators and clear pending
        if (i + 1 < n && stream.charAt(i + 1) == '<') i += 2
        else {
          val s = i + 1
          i += 1
          while (i < n && stream.charAt(i) != '>') i += 1
          val hex = stream.substring(s, math.min(i, n)).filterNot(_.isWhitespace)
          if (i < n) i += 1 // consume '>'
          if (hex.nonEmpty && hex.forall(ch => Character.digit(ch, 16) >= 0)) {
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            val sb = new StringBuilder(padded.length / 2)
            var h = 0
            while (h < padded.length) {
              sb.append(Integer.parseInt(padded.substring(h, h + 2), 16).toChar)
              h += 2
            }
            pending += sb.toString
          }
        }
      } else if (c == '\'' || c == '"') {
        // single-char show-text operators (move-and-show)
        emit(); i += 1
      } else if (c.isLetter) {
        val s = i
        while (i < n && (stream.charAt(i).isLetter || stream.charAt(i) == '*')) i += 1
        val op = stream.substring(s, i)
        if (op == "Tj" || op == "TJ") emit() else pending.clear()
      } else i += 1 // numbers, names, brackets, whitespace: skip
    }
    out.toString
  }
}
