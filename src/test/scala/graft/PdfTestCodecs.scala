package graft

/** Test-local reference encoders shared across PDF specs — kept
  * independent of the kernel's decoders so round-trips prove both
  * sides.
  */
object PdfTestCodecs {

  /** ASCII85 encode (§7.4.3), no 'z' short form, '~>' terminator. */
  def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    data.grouped(4).foreach { g =>
      val n = g.length
      var v = 0L
      for (k <- 0 until 4) v = (v << 8) | (if (k < n) g(k) & 0xffL else 0L)
      val digits = (0 until 5).map(k => ('!' + (v / math.pow(85, 4 - k).toLong % 85)).toChar)
      sb.appendAll(digits.take(n + 1))
    }
    sb.append("~>")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
