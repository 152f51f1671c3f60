package graft.kernels

/** Text normalization — the transcript analogue of the reference's
  * `SimpleTransformService` (deepdoctection/pipe/transform.py:32,
  * image rotation/deskew there; Unicode NFC + whitespace
  * canonicalization here). Applied at word level so character spans
  * keep indexing the RAW payload (the reference re-emits transformed
  * coordinates the same way, transform.py:86-96).
  */
object Normalize {
  /** Unicode NFC; identity for ASCII (fast path, no allocation). */
  def nfc(s: String): String = {
    var i = 0
    val n = s.length
    var ascii = true
    while (i < n && ascii) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }
}
