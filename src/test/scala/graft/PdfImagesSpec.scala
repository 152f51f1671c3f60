package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Pdf

/** CCITTFaxDecode (G3/G4 via the JDK TIFF reader behind a minimal
  * single-strip TIFF wrapper) and inline images (§8.9.7 BI/ID/EI).
  * Fax payloads are produced by the JDK TIFF WRITER — an encoder
  * independent of the kernel's wrap-and-read decode path.
  */
class PdfImagesSpec extends AnyFunSuite {

  /** CCITT strip bytes for the deterministic checker pattern — the
    * single shared JDK-TIFF-writer encoder (see SparkEntry.faxStrip
    * for the K↔compression-name mapping).
    */
  private def faxEncode(w: Int, h: Int, typ: String): Array[Byte] =
    SparkEntry.faxStrip(w, h, typ)

  /** Expected CCITTFaxDecode output bits for the checker pattern:
    * BlackIs1 false (default) → white = 1; row-packed MSB-first.
    */
  private def expectedPacked(w: Int, h: Int, blackIs1: Boolean): Array[Byte] = {
    val rowBytes = (w + 7) / 8
    val out = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val white = ((x / 3) + (y / 2)) % 2 == 0
      if (white != blackIs1)
        out(y * rowBytes + (x >> 3)) =
          (out(y * rowBytes + (x >> 3)) | (0x80 >> (x & 7))).toByte
    }
    out
  }

  private def deflate(b: Array[Byte]): Array[Byte] = Pdf.deflate(b)

  private def ascii85Encode(data: Array[Byte]): Array[Byte] =
    PdfTestCodecs.ascii85Encode(data)

  private def imagePdf(w: Int, h: Int, data: Array[Byte], entries: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 4 0 R >> >> >> endobj\n")
    put(s"4 0 obj << /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"$entries/Length ${data.length} >> stream\n")
    out.write(data)
    put("\nendstream endobj\n%%EOF\n")
    out.toByteArray
  }

  test("CCITT G4 (K<0) decodes to the exact bitonal pattern, bpc=1") {
    val w = 21; val h = 9
    val fax = faxEncode(w, h, "CCITT T.6")
    val pdf = imagePdf(w, h, fax, "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns $w /Rows $h >> ")
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.width, i.height, i.channels, i.bpc, i.format)) ==
      Seq((w, h, 1, 1, "raw")))
    assert(imgs.head.data.toSeq == expectedPacked(w, h, blackIs1 = false).toSeq)
  }

  test("CCITT G3 2-D (K>0, EOL+tag bits) decodes; /Rows falls back to /Height") {
    val w = 16; val h = 6
    val fax = faxEncode(w, h, "CCITT T.4")
    // no /Rows in the parms — the kernel must use /Height
    val pdf = imagePdf(w, h, fax, "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /CCITTFaxDecode /DecodeParms << /K 1 /Columns $w >> ")
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.width, i.height, i.bpc)) == Seq((w, h, 1)))
    assert(imgs.head.data.toSeq == expectedPacked(w, h, blackIs1 = false).toSeq)
  }

  test("CCITT G3 1-D (K=0) Modified-Huffman with /EncodedByteAlign decodes") {
    val w = 16; val h = 6
    val fax = faxEncode(w, h, "CCITT RLE") // MH: no EOLs, byte-aligned rows
    val pdf = imagePdf(w, h, fax, "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /CCITTFaxDecode /DecodeParms << /K 0 /Columns $w /Rows $h /EncodedByteAlign true >> ")
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.width, i.height, i.bpc)) == Seq((w, h, 1)))
    assert(imgs.head.data.toSeq == expectedPacked(w, h, blackIs1 = false).toSeq)
  }

  test("EOL-less unaligned K=0 skips (no TIFF expression) instead of garbling") {
    val w = 16; val h = 6
    val fax = faxEncode(w, h, "CCITT RLE")
    // same MH payload but WITHOUT EncodedByteAlign: the kernel cannot
    // prove row alignment, and a wrong declaration garbles silently
    val pdf = imagePdf(w, h, fax, "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /CCITTFaxDecode /DecodeParms << /K 0 /Columns $w /Rows $h >> ")
    assert(Pdf.extractImages(pdf).isEmpty)
  }

  test("/BlackIs1 true inverts the emitted bit polarity") {
    val w = 12; val h = 4
    val fax = faxEncode(w, h, "CCITT T.6")
    val pdf = imagePdf(w, h, fax, "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns $w /Rows $h /BlackIs1 true >> ")
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.head.data.toSeq == expectedPacked(w, h, blackIs1 = true).toSeq)
  }

  test("EncodedByteAlign with G4 skips (no TIFF expression) instead of garbling") {
    val w = 12; val h = 4
    val fax = faxEncode(w, h, "CCITT T.6")
    val pdf = imagePdf(w, h, fax, "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns $w /Rows $h /EncodedByteAlign true >> ")
    assert(Pdf.extractImages(pdf).isEmpty)
  }

  test("/DeviceN color space counts one channel per colorant name") {
    val w = 5; val h = 4
    val raw = Array.tabulate[Byte](w * h * 3)(i => (i * 3 + 1).toByte)
    val pdf = imagePdf(w, h, Pdf.deflate(raw),
      "/ColorSpace [ /DeviceN [ /Cyan /Magenta /Spot1 ] /DeviceRGB 9 0 R ] " +
        "/BitsPerComponent 8 /Filter /FlateDecode ")
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.width, i.height, i.channels, i.bpc)) == Seq((w, h, 3, 8)))
    assert(imgs.head.data.toSeq == raw.toSeq)
  }

  // ---- inline images ----

  private def contentPdf(content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    put(s"4 0 obj << /Length ${content.length} >> stream\n")
    out.write(content)
    put("\nendstream endobj\n%%EOF\n")
    out.toByteArray
  }

  test("unfiltered inline image: exact payload length, even with ' EI ' bytes inside") {
    // 4x3 RGB, 36 raw bytes that deliberately contain the letters
    // ' EI ' — the computed length must win over token scanning
    val raw = Array.tabulate[Byte](36)(i => (i * 7 + 1).toByte)
    raw(10) = ' '.toByte; raw(11) = 'E'.toByte; raw(12) = 'I'.toByte; raw(13) = ' '.toByte
    val body = new java.io.ByteArrayOutputStream()
    body.write("q BI /W 4 /H 3 /CS /RGB /BPC 8 ID ".getBytes(ISO_8859_1))
    body.write(raw)
    body.write(" EI Q BT /F1 12 Tf (after image) Tj ET".getBytes(ISO_8859_1))
    val pdf = contentPdf(body.toByteArray)
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.pageNo, i.width, i.height, i.channels, i.bpc, i.format)) ==
      Seq((1, 4, 3, 3, 8, "raw")))
    assert(imgs.head.data.toSeq == raw.toSeq)
    // the page text still extracts around the image
    assert(Pdf.splitPages(pdf).map(_.text) == Seq("after image"))
  }

  test("Flate inline image: EI-candidate scan accepts only the exactly-sized decode") {
    val raw = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 13 + 2).toByte)
    val z = Pdf.deflate(raw)
    val body = new java.io.ByteArrayOutputStream()
    body.write("BI /W 4 /H 3 /CS /RGB /BPC 8 /F /Fl ID ".getBytes(ISO_8859_1))
    body.write(z)
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.width, i.height, i.channels)) == Seq((4, 3, 3)))
    assert(imgs.head.data.toSeq == raw.toSeq)
  }

  test("inline image mask (/IM true) is 1-channel 1-bit; abbreviated keys") {
    val w = 10; val h = 3 // rowBytes 2
    val packed = Array[Byte](0x5a, 0x40.toByte, 0x3c, 0x80.toByte, 0xff.toByte, 0xc0.toByte)
    val body = new java.io.ByteArrayOutputStream()
    body.write(s"BI /W $w /H $h /IM true ID ".getBytes(ISO_8859_1))
    body.write(packed)
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.width, i.height, i.channels, i.bpc)) == Seq((w, h, 1, 1)))
    assert(imgs.head.data.toSeq == packed.toSeq)
  }

  test("/Rows 0 (decode-until-EOD) falls back to /Height instead of skipping") {
    val w = 21; val h = 9
    val fax = faxEncode(w, h, "CCITT T.6")
    val pdf = imagePdf(w, h, fax, "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns $w /Rows 0 >> ")
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.width, i.height, i.bpc)) == Seq((w, h, 1)))
    assert(imgs.head.data.toSeq == expectedPacked(w, h, blackIs1 = false).toSeq)
  }

  test("a 'BI' byte pair inside a consumed payload starts no phantom parse") {
    // image 1's raw payload contains a delimited ' BI ' run; a scanner
    // that rescans consumed bytes would pair it with image 2's 'ID'
    // and emit a duplicate/garbage third image
    val raw1 = Array.tabulate[Byte](36)(i => (i * 7 + 1).toByte)
    raw1(10) = ' '.toByte; raw1(11) = 'B'.toByte; raw1(12) = 'I'.toByte; raw1(13) = ' '.toByte
    val raw2 = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 5 + 3).toByte)
    val body = new java.io.ByteArrayOutputStream()
    body.write("q BI /W 4 /H 3 /CS /RGB /BPC 8 ID ".getBytes(ISO_8859_1))
    body.write(raw1)
    body.write(" EI Q BI /W 2 /H 2 /CS /RGB /BPC 8 ID ".getBytes(ISO_8859_1))
    body.write(raw2)
    body.write(" EI Q".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.name, i.width, i.height)) ==
      Seq(("BI#1", 4, 3), ("BI#2", 2, 2)))
    assert(imgs.map(_.data.toSeq) == Seq(raw1.toSeq, raw2.toSeq))
  }

  test("BI#n names stay distinct across a page's multiple /Contents streams") {
    val raw = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 3 + 1).toByte)
    def stream(n: Int, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(s"$n 0 obj << /Length ${data.length} >> stream\n".getBytes(ISO_8859_1))
      b.write(data)
      b.write("\nendstream endobj\n".getBytes(ISO_8859_1))
      b.toByteArray
    }
    def biContent: Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("BI /W 2 /H 2 /CS /RGB /BPC 8 ID ".getBytes(ISO_8859_1))
      b.write(raw)
      b.write(" EI".getBytes(ISO_8859_1))
      b.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n")
    out.write(stream(4, biContent))
    out.write(stream(5, biContent))
    put("%%EOF\n")
    val imgs = Pdf.extractImages(out.toByteArray)
    assert(imgs.map(i => (i.pageNo, i.name)) == Seq((1, "BI#1"), (1, "BI#2")))
    assert(imgs.forall(_.data.toSeq == raw.toSeq))
  }

  /** Reference RunLength encoder (literal-run only — a valid, if
    * unoptimal, §7.4.5 encoding) for round-trip fixtures.
    */
  private def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      val n = math.min(128, data.length - i)
      out.write(n - 1)
      out.write(data, i, n)
      i += n
    }
    out.write(128) // EOD
    out.toByteArray
  }

  test("RunLengthDecode: literal and repeat runs, EOD honored, truncation skips") {
    // hand-built mixed-run stream: 3 literals, a 5x repeat, EOD,
    // then trailing bytes that must NOT be decoded
    val enc = Array[Byte](2, 10, 20, 30, (257 - 5 - 256).toByte, 7, 128.toByte, 99, 99)
    assert(Pdf.runLength(enc).map(_.toSeq) ==
      Some(Seq[Byte](10, 20, 30, 7, 7, 7, 7, 7)))
    // a literal run promising more bytes than remain is corrupt
    assert(Pdf.runLength(Array[Byte](5, 1, 2)).isEmpty)
    // a repeat run with no byte to repeat is corrupt
    assert(Pdf.runLength(Array[Byte](200.toByte)).isEmpty)
  }

  test("RunLengthDecode image XObject round-trips through extractImages") {
    val w = 5; val h = 4
    val raw = Array.tabulate[Byte](w * h * 3)(i => (i * 11 + 3).toByte)
    val pdf = imagePdf(w, h, rleEncode(raw),
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /RunLengthDecode ")
    val imgs = Pdf.extractImages(pdf)
    assert(imgs.map(i => (i.width, i.height, i.channels, i.bpc)) == Seq((w, h, 3, 8)))
    assert(imgs.head.data.toSeq == raw.toSeq)
  }

  test("inline image /L delimits exactly — even when the payload spells ' EI '") {
    val raw = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 13 + 2).toByte)
    raw(8) = ' '.toByte; raw(9) = 'E'.toByte; raw(10) = 'I'.toByte; raw(11) = ' '.toByte
    val z = Pdf.deflate(raw)
    val body = new java.io.ByteArrayOutputStream()
    body.write(s"BI /W 4 /H 3 /CS /RGB /BPC 8 /F /Fl /L ${z.length} ID ".getBytes(ISO_8859_1))
    body.write(z)
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.width, i.height, i.channels)) == Seq((4, 3, 3)))
    assert(imgs.head.data.toSeq == raw.toSeq)
  }

  test("inline DCT (JPEG) decodes with /L, and without /L via the marker-structure scan") {
    val w = 9; val h = 7
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 29 + y * 17) * 1000)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    def body(withL: Boolean): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val l = if (withL) s"/L ${jpeg.length} " else ""
      b.write(s"BI /W $w /H $h /CS /RGB /BPC 8 /F /DCT ${l}ID ".getBytes(ISO_8859_1))
      b.write(jpeg)
      b.write(" EI".getBytes(ISO_8859_1))
      b.toByteArray
    }
    val withL = Pdf.extractImages(contentPdf(body(withL = true)))
    assert(withL.map(i => (i.width, i.height, i.channels, i.format)) ==
      Seq((w, h, 3, "jpeg")))
    assert(withL.head.data.toSeq == jpeg.toSeq)
    // without /L the JPEG marker structure proves its own boundary:
    // same dims, and the payload is delimited to EXACTLY the source
    // bytes (one byte over would swallow the ' EI' terminator)
    val noL = Pdf.extractImages(contentPdf(body(withL = false)))
    assert(noL.map(i => (i.width, i.height, i.channels, i.format)) ==
      Seq((w, h, 3, "jpeg")))
    assert(noL.head.data.toSeq == jpeg.toSeq)
  }

  test("bare inline DCT without /L: structural scan resumes the cursor past EOI") {
    // JPEG inline image followed by a raw inline image — a wrong
    // boundary would either miss the second BI or parse a phantom
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, (x + y * 5) * 40000)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val body = new java.io.ByteArrayOutputStream()
    body.write("q BI /W 5 /H 4 /CS /RGB /BPC 8 /F /DCT ID ".getBytes(ISO_8859_1))
    body.write(jb.toByteArray)
    body.write(" EI Q BI /W 2 /H 2 /CS /G /BPC 8 ID ".getBytes(ISO_8859_1))
    body.write(Array.tabulate[Byte](4)(_.toByte))
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.name, i.format, i.width, i.height)) ==
      Seq(("BI#1", "jpeg", 5, 4), ("BI#2", "raw", 2, 2)))
  }

  test("truncated inline JPEG without /L skips instead of garbling") {
    val img = new java.awt.image.BufferedImage(
      6, 6, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    val body = new java.io.ByteArrayOutputStream()
    body.write("BI /W 6 /H 6 /CS /RGB /BPC 8 /F /DCT ID ".getBytes(ISO_8859_1))
    body.write(jpeg, 0, jpeg.length - 10) // drop the tail incl. EOI
    body.write(" EI".getBytes(ISO_8859_1))
    assert(Pdf.extractImages(contentPdf(body.toByteArray)).isEmpty)
  }

  test("ASCII85-wrapped inline DCT without /L delimits at the '~>' terminator") {
    val w = 4; val h = 3
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 3 + y) * 90000)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    val body = new java.io.ByteArrayOutputStream()
    body.write("BI /W 4 /H 3 /CS /RGB /BPC 8 /F [/A85 /DCT] ID ".getBytes(ISO_8859_1))
    body.write(ascii85Encode(jpeg))
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.format, i.width, i.height)) == Seq(("jpeg", w, h)))
    assert(imgs.head.data.toSeq == jpeg.toSeq)
    // behind a NON-self-terminating transport (Flate) with no /L the
    // boundary stays unprovable — skip, never garble
    val fl = new java.io.ByteArrayOutputStream()
    fl.write("BI /W 4 /H 3 /CS /RGB /BPC 8 /F [/Fl /DCT] ID ".getBytes(ISO_8859_1))
    fl.write(deflate(jpeg))
    fl.write(" EI".getBytes(ISO_8859_1))
    assert(Pdf.extractImages(contentPdf(fl.toByteArray)).isEmpty)
  }

  test("marker-structure scan recovers the exact byte length of every writer JPEG") {
    // sweep of shapes: the scan must end exactly at EOI whatever the
    // segment layout — trailing bytes after the JPEG prove exactness
    for (w <- Seq(1, 2, 5, 16, 33); h <- Seq(1, 3, 8, 21)) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 7) * 12345)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", o)
      val jpeg = o.toByteArray
      val body = new java.io.ByteArrayOutputStream()
      body.write(s"BI /W $w /H $h /CS /RGB /BPC 8 /F /DCT ID ".getBytes(ISO_8859_1))
      body.write(jpeg)
      body.write(" EI".getBytes(ISO_8859_1))
      val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
      assert(imgs.map(i => (i.width, i.height)) == Seq((w, h)), s"dims at ${w}x$h")
      assert(imgs.head.data.length == jpeg.length, s"scan length at ${w}x$h")
    }
  }

  test("A85 inline DCT with a corrupt terminator cannot adopt a later stream's '~>'") {
    // image 1's '~>' is stripped; indexOf would find image 2's
    // terminator, decode the concatenated run (space/E/I/Q/B are all
    // valid ASCII85 digits) and emit a junk-extended JPEG while
    // swallowing image 2 — the structural-exactness gate must skip
    // image 1 and still extract image 2
    def jpegOf(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * seed + y) * 30000)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", o)
      o.toByteArray
    }
    val a1 = ascii85Encode(jpegOf(4, 3, 7))
    val body = new java.io.ByteArrayOutputStream()
    body.write("BI /W 4 /H 3 /CS /RGB /BPC 8 /F [/A85 /DCT] ID ".getBytes(ISO_8859_1))
    body.write(a1, 0, a1.length - 2) // corrupt: drop the '~>'
    body.write(" EI Q BI /W 6 /H 5 /CS /RGB /BPC 8 /F [/A85 /DCT] ID ".getBytes(ISO_8859_1))
    body.write(ascii85Encode(jpegOf(6, 5, 13)))
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.width, i.height, i.format)) == Seq((6, 5, "jpeg")))
  }

  test("inline Flate image honors /DP TIFF predictor 2 (differenced bytes undone)") {
    val w = 4; val h = 3; val colors = 3
    val raw = Array.tabulate[Byte](w * h * colors)(i => ((i * 7 + 3) & 0xff).toByte)
    // test-local reference differencer (§7.4.4.3, 8-bpc)
    val enc = raw.clone()
    for (y <- 0 until h; i <- (y * w * colors until (y + 1) * w * colors).reverse
         if i - y * w * colors >= colors)
      enc(i) = (enc(i) - enc(i - colors)).toByte
    val body = new java.io.ByteArrayOutputStream()
    body.write(("BI /W 4 /H 3 /CS /RGB /BPC 8 /F /Fl " +
      "/DP << /Predictor 2 /Columns 4 /Colors 3 /BitsPerComponent 8 >> ID ")
      .getBytes(ISO_8859_1))
    body.write(deflate(enc))
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.width, i.height, i.channels)) == Seq((4, 3, 3)))
    assert(imgs.head.data.toSeq == raw.toSeq) // NOT the differenced bytes
  }

  test("inline Flate image honors /DP PNG predictor (Up rows with filter bytes)") {
    val w = 5; val h = 4; val colors = 3
    val rowBytes = w * colors
    val raw = Array.tabulate[Byte](rowBytes * h)(i => ((i * 11 + 1) & 0xff).toByte)
    // PNG Up encoding: each row prefixed with filter byte 2, samples
    // minus the row above (zero row for the first)
    val enc = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      enc.write(2)
      for (x <- 0 until rowBytes) {
        val prev = if (y == 0) 0 else raw((y - 1) * rowBytes + x) & 0xff
        enc.write(((raw(y * rowBytes + x) & 0xff) - prev) & 0xff)
      }
    }
    val body = new java.io.ByteArrayOutputStream()
    body.write(("BI /W 5 /H 4 /CS /RGB /BPC 8 /F /Fl " +
      "/DP << /Predictor 12 /Columns 5 /Colors 3 /BitsPerComponent 8 >> ID ")
      .getBytes(ISO_8859_1))
    body.write(deflate(enc.toByteArray))
    body.write(" EI".getBytes(ISO_8859_1))
    val imgs = Pdf.extractImages(contentPdf(body.toByteArray))
    assert(imgs.map(i => (i.width, i.height, i.channels)) == Seq((5, 4, 3)))
    assert(imgs.head.data.toSeq == raw.toSeq)
  }

  test("inline image with an unknown color space skips; XObjects on the page survive") {
    val raw = Array.tabulate[Byte](8)(i => i.toByte)
    val body = new java.io.ByteArrayOutputStream()
    body.write("BI /W 4 /H 2 /CS /MySpace /BPC 8 ID ".getBytes(ISO_8859_1))
    body.write(raw)
    body.write(" EI".getBytes(ISO_8859_1))
    assert(Pdf.extractImages(contentPdf(body.toByteArray)).isEmpty)
  }
}
