package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Pdf
import graft.sources.Serializers

/** Per-page re-emission (`SerializerPdfDoc.split` parity,
  * custom_serialize.py:713-717): each page of a multi-page document
  * re-emitted as a standalone one-page PDF, verified by RE-PARSING
  * the emitted bytes and comparing text with the source page.
  */
class PdfEmitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def deflate(b: Array[Byte]): Array[Byte] = Pdf.deflate(b)

  private def flateDoc(texts: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = texts.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    put(s"2 0 obj << /Type /Pages /Kids [$kids] /Count ${texts.length} >> endobj\n")
    texts.zipWithIndex.foreach { case (txt, i) =>
      val pageObj = 3 + 2 * i
      put(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R /Contents ${pageObj + 1} 0 R >> endobj\n")
      val data = deflate(s"BT /F1 12 Tf ($txt) Tj ET".getBytes(ISO_8859_1))
      put(s"${pageObj + 1} 0 obj << /Length ${data.length} /Filter /FlateDecode >> stream\n")
      out.write(data)
      put("\nendstream endobj\n")
    }
    put("%%EOF\n")
    out.toByteArray
  }

  test("a 3-page document splits into standalone one-page PDFs with identical text") {
    val texts = Seq("first page text", "second page text", "third page text")
    val doc = flateDoc(texts)
    val emitted = Pdf.emitPages(doc)
    assert(emitted.map(_._1) == Seq(1, 2, 3))
    for (((n, bytes), txt) <- emitted.zip(texts)) {
      val s = new String(bytes, ISO_8859_1)
      assert(s.startsWith("%PDF-") && s.contains("xref") && s.endsWith("%%EOF\n"), s"page $n shape")
      val pages = Pdf.splitPages(bytes)
      assert(pages.map(_.pageNo) == Seq(1), s"page $n re-parse count")
      assert(pages.head.text == txt, s"page $n text")
    }
    // and the emitted page is standalone: parsing page 2's bytes
    // never sees page 1/3 content
    val s2 = new String(emitted(1)._2, ISO_8859_1)
    assert(!s2.contains("first page") && !s2.contains("third page"))
  }

  test("a 50k-deep object-reference chain emits without stack overflow") {
    // attacker-shaped input: the page references object 5, which
    // references 6, which references 7, … — a recursive closure walk
    // dies with StackOverflowError (fatal to a Spark task); the
    // explicit-stack walk must survive and still emit a page that
    // re-parses to the right text
    val depth = 50000
    val content = "BT /F1 12 Tf (deep chain) Tj ET"
    val out = new java.io.ByteArrayOutputStream(depth * 40)
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R /PieceInfo 5 0 R >> endobj\n")
    put(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    for (i <- 5 until (5 + depth))
      put(s"$i 0 obj << /Next ${i + 1} 0 R >> endobj\n")
    put(s"${5 + depth} 0 obj << >> endobj\n%%EOF\n")
    val emitted = Pdf.emitPages(out.toByteArray)
    assert(emitted.map(_._1) == Seq(1))
    assert(Pdf.splitPages(emitted.head._2).map(_.text) == Seq("deep chain"))
  }

  test("the reference closure carries fonts and CMaps: a CID page round-trips") {
    // Type0 font + Flate-compressed ToUnicode CMap referenced from
    // /Resources — the closure must drag font object AND cmap stream
    val cmap = "1 begincodespacerange <0000> <FFFF> endcodespacerange " +
      "1 beginbfrange <0000> <00FF> <0000> endbfrange"
    val cdata = deflate(cmap.getBytes(ISO_8859_1))
    val txt = "cid page"
    val content = s"BT /F1 12 Tf <${txt.map(c => f"${c.toInt}%04X").mkString}> Tj ET"
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.5\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> " +
      "/Contents 4 0 R >> endobj\n")
    put(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    put("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n")
    put(s"6 0 obj << /Length ${cdata.length} /Filter /FlateDecode >> stream\n")
    out.write(cdata)
    put("\nendstream endobj\n%%EOF\n")
    val emitted = Pdf.emitPages(out.toByteArray)
    assert(emitted.map(_._1) == Seq(1))
    assert(Pdf.splitPages(emitted.head._2).map(_.text) == Seq(txt))
  }

  test("inherited /Resources (on the /Pages ancestor) are copied into the emitted page") {
    val cmap = "1 beginbfchar <41> <0058> endbfchar"
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val content = "BT /F1 12 Tf (AB) Tj ET"
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /Resources << /Font << " +
      "/F1 << /Subtype /TrueType /ToUnicode 5 0 R >> >> >> >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    put(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    put(s"5 0 obj << /Length ${cmap.length} >> stream\n$cmap\nendstream endobj\n%%EOF\n")
    val emitted = Pdf.emitPages(out.toByteArray)
    // the SOURCE parse reads no inherited resources (documented
    // subset), but the EMITTED page carries them inline, so the CMap
    // applies on re-parse: A→X, unmapped B dropped
    assert(Pdf.splitPages(emitted.head._2).map(_.text) == Seq("X"))
  }

  test("emitted pages from an encrypted source are decrypted and re-parse cleanly") {
    val o32 = Array.tabulate(32)(i => (i * 7 + 3).toByte)
    val id0 = Array.tabulate(16)(i => (i * 13 + 1).toByte)
    val fileKey = Pdf.deriveFileKey(o32, -44, id0, r = 3, lengthBits = 128)
    val u = Pdf.expectedU(fileKey, id0, r = 3).take(16) ++ Array.fill[Byte](16)(0)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString
    val texts = Seq("enc page one", "enc page two")
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    texts.zipWithIndex.foreach { case (txt, i) =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      put(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R /Contents $contObj 0 R >> endobj\n")
      val enc = Pdf.PdfCrypt(fileKey).decrypt(contObj, 0,
        s"BT /F1 12 Tf ($txt) Tj ET".getBytes(ISO_8859_1)).get
      put(s"$contObj 0 obj << /Length ${enc.length} >> stream\n")
      out.write(enc)
      put("\nendstream endobj\n")
    }
    put(s"7 0 obj << /Filter /Standard /V 2 /R 3 /Length 128 /P -44 " +
      s"/O <${hex(o32)}> /U <${hex(u)}> >> endobj\n")
    put(s"trailer << /Root 1 0 R /Encrypt 7 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF\n")
    val emitted = Pdf.emitPages(out.toByteArray)
    assert(emitted.map(_._1) == Seq(1, 2))
    for (((_, bytes), txt) <- emitted.zip(texts)) {
      // no /Encrypt survives; the page re-parses as plaintext
      assert(!new String(bytes, ISO_8859_1).contains("/Encrypt"))
      assert(Pdf.splitPages(bytes).map(_.text) == Seq(txt))
    }
  }

  test("image XObjects survive re-emission") {
    val samples = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 7 + 1).toByte)
    val flate = deflate(samples)
    val content = "q 10 0 0 10 0 0 cm /Im1 Do Q"
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 5 0 R >> >> " +
      "/Contents 4 0 R >> endobj\n")
    put(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    put("5 0 obj << /Type /XObject /Subtype /Image /Width 4 /Height 3 " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length ${flate.length} >> stream\n")
    out.write(flate)
    put("\nendstream endobj\n%%EOF\n")
    val emitted = Pdf.emitPages(out.toByteArray)
    val imgs = Pdf.extractImages(emitted.head._2)
    assert(imgs.map(i => (i.width, i.height, i.channels, i.format)) == Seq((4, 3, 3, "raw")))
    assert(imgs.head.data.toSeq == samples.toSeq)
  }

  test("a page back-reference (/Annots /P) and a dangling ref don't break re-emission") {
    // widget/link annotations standardly carry /P <page> — the page
    // must NOT re-enter the closure (it double-assigned its number
    // and crashed the xref writer); a ref whose target is absent
    // (freed by an incremental update) rewrites to a null object
    // instead of aliasing a renumbered one. The annotation also
    // carries a '(… 12 0 Rows …)' string: the ref-token boundary must
    // not rewrite it.
    val content = "BT /F1 12 Tf (annotated page) Tj ET"
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Annots [5 0 R] /Contents 4 0 R >> endobj\n")
    put(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    put("5 0 obj << /Type /Annot /Subtype /Link /P 3 0 R /A 99 0 R " +
      "/T (see 12 0 Rows below) /Rect [0 0 10 10] >> endobj\n%%EOF\n")
    val emitted = Pdf.emitPages(out.toByteArray)
    assert(emitted.map(_._1) == Seq(1))
    val s = new String(emitted.head._2, ISO_8859_1)
    assert(Pdf.splitPages(emitted.head._2).map(_.text) == Seq("annotated page"))
    // /P points at the page's NEW number (3); the dangling /A ref
    // points at the emitted null object; the string is untouched
    assert(s.contains("/P 3 0 R"), s)
    assert(s.contains(" null endobj") || s.contains(" null\nendobj"), s)
    assert(s.contains("(see 12 0 Rows below)"), s)
    assert(!s.contains("/A 99 0 R"), s)
  }

  test("ref-shaped text inside literal strings is neither rewritten nor pulled into the closure") {
    // two traps in one document: a DANGLING ref-shape '(Exhibit 99 0 R)'
    // (object 99 absent — rewriting it would corrupt the visible text
    // AND mint a spurious null object) and an EXISTING object's
    // ref-shape '(see 6 0 R)' (object 6 is an unrelated orphan — the
    // closure scanner must not drag it in)
    val content = "BT /F1 12 Tf (stringy page) Tj ET"
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Annots [5 0 R] /Contents 4 0 R >> endobj\n")
    put(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    put("5 0 obj << /Type /Annot /Subtype /Text /Contents (Exhibit 99 0 R) " +
      "/T (see 6 0 R) /Rect [0 0 10 10] >> endobj\n")
    put("6 0 obj << /Type /Metadata /Orphan true >> endobj\n%%EOF\n")
    val emitted = Pdf.emitPages(out.toByteArray)
    val s = new String(emitted.head._2, ISO_8859_1)
    assert(Pdf.splitPages(emitted.head._2).map(_.text) == Seq("stringy page"))
    assert(s.contains("(Exhibit 99 0 R)"), s)
    assert(s.contains("(see 6 0 R)"), s)
    // no spurious null object, no orphan adoption
    assert(!s.contains(" null"), s)
    assert(!s.contains("/Orphan"), s)
  }

  test("Indexed color space reports 1 channel (palette indices), never the base space's") {
    // /Indexed [/DeviceRGB …] payload is w×h palette INDICES; labeling
    // it 3-channel would make a stride-computing consumer read 3× past
    // the buffer
    val w = 6; val h = 4
    val idx = Array.tabulate[Byte](w * h)(i => (i % 5).toByte)
    val flate = deflate(idx)
    val palette = (0 until 15).map(i => f"$i%02X").mkString
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 4 0 R >> >> >> endobj\n")
    put(s"4 0 obj << /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace [/Indexed /DeviceRGB 4 <$palette>] /BitsPerComponent 8 " +
      s"/Filter /FlateDecode /Length ${flate.length} >> stream\n")
    out.write(flate)
    put("\nendstream endobj\n%%EOF\n")
    val imgs = Pdf.extractImages(out.toByteArray)
    assert(imgs.map(i => (i.width, i.height, i.channels, i.bpc, i.format)) ==
      Seq((w, h, 1, 8, "raw")))
    assert(imgs.head.data.toSeq == idx.toSeq)
  }

  test("declared channels disagreeing with the payload size skip the image (never mislabel)") {
    val w = 6; val h = 4
    val gray = Array.tabulate[Byte](w * h)(i => i.toByte) // 1-channel bytes
    val flate = deflate(gray)
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 4 0 R >> >> >> endobj\n")
    // lies: claims RGB over a w*h payload
    put(s"4 0 obj << /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length ${flate.length} >> stream\n")
    out.write(flate)
    put("\nendstream endobj\n%%EOF\n")
    assert(Pdf.extractImages(out.toByteArray).isEmpty)
  }

  test("1-bit bitonal raster carries bpc=1 with row-packed payload intact") {
    // the most common scanned-page raster: /DeviceGray /BitsPerComponent
    // 1 — data is ceil(w/8)*h packed bytes and bpc is part of the
    // payload contract
    val w = 10; val h = 3 // rowBytes = 2
    val packed = Array[Byte](0x5a, 0x40.toByte, 0x3c, 0x80.toByte, 0xff.toByte, 0xc0.toByte)
    val flate = deflate(packed)
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 4 0 R >> >> >> endobj\n")
    put(s"4 0 obj << /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /FlateDecode /Length ${flate.length} >> stream\n")
    out.write(flate)
    put("\nendstream endobj\n%%EOF\n")
    val imgs = Pdf.extractImages(out.toByteArray)
    assert(imgs.map(i => (i.width, i.height, i.channels, i.bpc, i.format)) ==
      Seq((w, h, 1, 1, "raw")))
    assert(imgs.head.data.toSeq == packed.toSeq)
  }

  test("property: emit→re-parse text equals source split text across generated documents") {
    // deterministic pseudo-random documents: varying page counts,
    // filters (plain/Flate/chained A85+Flate), fonts (none/CID),
    // content-stream arrays — the invariant is per-page text equality
    // between the SOURCE document's split and each emitted standalone
    // page's re-parse
    val rnd = new scala.util.Random(0x9e3779b9L)
    for (doc <- 0 until 25) {
      val nPages = 1 + rnd.nextInt(4)
      val texts = (1 to nPages).map(p => s"doc $doc page $p word${rnd.nextInt(1000)}")
      val variant = rnd.nextInt(3) // 0 plain, 1 flate, 2 a85+flate
      val cid = rnd.nextBoolean()
      val out = new java.io.ByteArrayOutputStream()
      def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      put("%PDF-1.5\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      val kids = texts.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      put(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n")
      val fontObj = 3 + 2 * nPages
      texts.zipWithIndex.foreach { case (txt, i) =>
        val pageObj = 3 + 2 * i
        val res = if (cid) s"/Resources << /Font << /F1 $fontObj 0 R >> >> " else ""
        put(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R $res/Contents ${pageObj + 1} 0 R >> endobj\n")
        val content =
          if (cid) s"BT /F1 12 Tf <${txt.map(c => f"${c.toInt}%04X").mkString}> Tj ET"
          else s"BT /F1 12 Tf ($txt) Tj ET"
        val (data, filter) = variant match {
          case 1 => (deflate(content.getBytes(ISO_8859_1)), "/Filter /FlateDecode ")
          case 2 =>
            val z = deflate(content.getBytes(ISO_8859_1))
            (PdfTestCodecs.ascii85Encode(z), "/Filter [/ASCII85Decode /FlateDecode] ")
          case _ => (content.getBytes(ISO_8859_1), "")
        }
        put(s"${pageObj + 1} 0 obj << /Length ${data.length} $filter>> stream\n")
        out.write(data)
        put("\nendstream endobj\n")
      }
      if (cid) {
        val cmap = "1 beginbfrange <0000> <00FF> <0000> endbfrange"
        put(s"$fontObj 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
          s"/ToUnicode ${fontObj + 1} 0 R >> endobj\n")
        put(s"${fontObj + 1} 0 obj << /Length ${cmap.length} >> stream\n$cmap\nendstream endobj\n")
      }
      put("%%EOF\n")
      val bytes = out.toByteArray
      val srcTexts = Pdf.splitPages(bytes).map(_.text)
      assert(srcTexts == texts, s"doc $doc source split (variant=$variant cid=$cid)")
      val emitted = Pdf.emitPages(bytes)
      assert(emitted.map(_._1) == (1 to nPages), s"doc $doc page numbers")
      val roundTrip = emitted.map { case (_, b) =>
        val pages = Pdf.splitPages(b)
        assert(pages.length == 1, s"doc $doc emitted page not standalone")
        pages.head.text
      }
      assert(roundTrip == srcTexts, s"doc $doc round-trip (variant=$variant cid=$cid)")
    }
  }

  test("readPdfPageDocs yields the reference datapoint shape with re-parseable pdf_bytes") {
    val dir = Files.createTempDirectory("graft_pdfdocs")
    Files.write(dir.resolve("reportA.pdf"),
      flateDoc(Seq("alpha one", "alpha two")))
    Files.write(dir.resolve("reportB.pdf"), flateDoc(Seq("beta only")))
    val rows = Serializers.readPdfPageDocs(spark, dir.toString)
      .orderBy("file_name").collect()
    assert(rows.map(r => (r.getAs[String]("file_name"),
      r.getAs[Int]("page_number"))).toSeq ==
      Seq(("reportA_1.pdf", 1), ("reportA_2.pdf", 2), ("reportB_1.pdf", 1)))
    val texts = rows.map(r =>
      Pdf.splitPages(r.getAs[Array[Byte]]("pdf_bytes")).map(_.text).mkString)
    assert(texts.toSeq == Seq("alpha one", "alpha two", "beta only"))
    // document_id: deterministic per SOURCE doc, distinct across docs
    val ids = rows.map(r => r.getAs[String]("document_id"))
    assert(ids(0) == ids(1) && ids(0) != ids(2))
    assert(ids(0) == graft.model.Ids.uuid3("reportA"))
  }
}
