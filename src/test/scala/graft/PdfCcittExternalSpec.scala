package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Pdf

/** CCITT decode against EXTERNALLY-encoded fixtures: the committed
  * payloads were produced by tools/make_ccitt_fixtures.py — a pure
  * Python encoder written from the published ITU-T T.4/T.6 code
  * tables, sharing zero code with the JDK codecs the kernel decodes
  * through. The sibling PdfImagesSpec round-trips through the JDK
  * TIFF writer; this suite excludes same-vendor encoder/decoder bug
  * cancellation (the PdfExternalSpec KDF-anchoring precedent).
  */
class PdfCcittExternalSpec extends AnyFunSuite {

  private val W = 24
  private val H = 10

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf/$name")
    require(in != null, s"missing committed fixture /pdf/$name")
    try in.readAllBytes() finally in.close()
  }

  /** Expected CCITTFaxDecode output for the checker pattern (white
    * where (x/3 + y/2) % 2 == 0): BlackIs1 false → white = 1,
    * row-packed MSB-first.
    */
  private def expectedPacked(): Array[Byte] = {
    val rowBytes = (W + 7) / 8
    val out = new Array[Byte](rowBytes * H)
    for (y <- 0 until H; x <- 0 until W)
      if (((x / 3) + (y / 2)) % 2 == 0)
        out(y * rowBytes + (x >> 3)) =
          (out(y * rowBytes + (x >> 3)) | (0x80 >> (x & 7))).toByte
    out
  }

  private def imagePdf(data: Array[Byte], entries: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    put("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    put("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im1 4 0 R >> >> >> endobj\n")
    put(s"4 0 obj << /Type /XObject /Subtype /Image /Width $W /Height $H " +
      "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /CCITTFaxDecode " +
      s"$entries/Length ${data.length} >> stream\n")
    out.write(data)
    put("\nendstream endobj\n%%EOF\n")
    out.toByteArray
  }

  private def decodeOne(data: Array[Byte], parms: String): Pdf.PdfImage = {
    val imgs = Pdf.extractImages(imagePdf(data, parms))
    assert(imgs.length == 1, s"expected one decoded image, got $imgs")
    val im = imgs.head
    assert((im.width, im.height, im.channels, im.bpc, im.format) ==
      (W, H, 1, 1, "raw"))
    im
  }

  test("MH (K=0 byte-aligned) fixture from the Python T.4 encoder decodes exactly") {
    val im = decodeOne(fixture(s"ccitt_mh_${W}x$H.bin"),
      s"/DecodeParms << /K 0 /EncodedByteAlign true /Columns $W /Rows $H >> ")
    assert(im.data.toSeq == expectedPacked().toSeq)
  }

  test("G3 1-D (K=0, EOL-prefixed rows) fixture decodes exactly") {
    val im = decodeOne(fixture(s"ccitt_g3_1d_${W}x$H.bin"),
      s"/DecodeParms << /K 0 /Columns $W /Rows $H >> ")
    assert(im.data.toSeq == expectedPacked().toSeq)
  }

  test("G3 2-D (K>0, EOL+tag bits) fixture decodes exactly") {
    val im = decodeOne(fixture(s"ccitt_g3_2d_${W}x$H.bin"),
      s"/DecodeParms << /K 1 /Columns $W /Rows $H >> ")
    assert(im.data.toSeq == expectedPacked().toSeq)
  }

  test("G4 (K<0, T.6 pass/horizontal/vertical modes) fixture decodes exactly") {
    val im = decodeOne(fixture(s"ccitt_g4_${W}x$H.bin"),
      s"/DecodeParms << /K -1 /Columns $W /Rows $H >> ")
    assert(im.data.toSeq == expectedPacked().toSeq)
  }

  test("marker-walk delimiter handles a multi-scan progressive JPEG structure") {
    val jpg = fixture("progressive.jpg")
    val s = new String(jpg, ISO_8859_1)
    // the walk must follow BOTH SOS scans (stuffed FF00 and RSTn
    // inside entropy data included) to the true EOI
    assert(Pdf.jpegScanLength(s, 0).contains(jpg.length))
    // truncation (EOI lost) must yield None, never a guess
    assert(Pdf.jpegScanLength(s.dropRight(2), 0).isEmpty)
  }
}
