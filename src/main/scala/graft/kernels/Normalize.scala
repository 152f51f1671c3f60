package graft.kernels

import java.text.Normalizer
import scala.collection.mutable.ArrayBuffer

/** Text normalization — the transcript analogue of the reference's
  * `SimpleTransformService` (deepdoctection/pipe/transform.py:32-96:
  * the image is transformed, annotation coordinates are re-emitted in
  * the transformed frame, and the originals are deactivated). Here the
  * "transform" is Unicode NFC + newline canonicalization (\r\n, \r →
  * \n), the re-emitted coordinates are character spans over the
  * NORMALIZED text, and [[OffsetMap]] is the lineage back to raw
  * offsets (the deactivated originals).
  *
  * The raw string is processed in canonical chunks — a chunk starts at
  * a starter (combining class 0) and extends over following combining
  * marks (and Hangul jamo V/T, which are ccc-0 starters that still
  * compose leftward) — so each chunk NFC-normalizes independently and
  * the chunk boundaries are exact raw↔normalized alignment anchors.
  * Runs of identity chunks collapse into one segment, so ASCII text
  * costs two array entries total.
  */
object Normalize {

  /** Unicode NFC; identity for ASCII (fast path, no allocation). */
  def nfc(s: String): String = {
    var i = 0
    val n = s.length
    var ascii = true
    while (i < n && ascii) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)
  }

  /** Piecewise raw↔normalized alignment. Segment i covers raw
    * [rawStarts(i), rawStarts(i+1)) and normalized
    * [normStarts(i), normStarts(i+1)); within identity segments the
    * mapping is offset-lockstep, within replaced segments offsets
    * clamp to the segment edge (begin → left edge, end → right edge),
    * so a remapped span always COVERS the raw text that produced it.
    */
  final class OffsetMap(val rawStarts: Array[Int], val normStarts: Array[Int],
      val identity: Array[Boolean]) {

    private def segmentOf(normOffset: Int): Int = {
      var lo = 0
      var hi = normStarts.length - 2
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (normStarts(mid) <= normOffset) lo = mid else hi = mid - 1
      }
      lo
    }

    /** Raw offset for a normalized span BEGIN (clamps left). */
    def toRawBegin(o: Int): Int = {
      if (o >= normStarts.last) return rawStarts.last
      val i = segmentOf(o)
      if (identity(i)) rawStarts(i) + (o - normStarts(i)) else rawStarts(i)
    }

    /** Raw offset for a normalized span END (exclusive; clamps right). */
    def toRawEnd(o: Int): Int = {
      if (o <= 0) return 0
      if (o >= normStarts.last) return rawStarts.last
      val i = segmentOf(o)
      if (o == normStarts(i)) rawStarts(i)
      else if (identity(i)) rawStarts(i) + (o - normStarts(i))
      else rawStarts(i + 1)
    }
  }

  private def isJamoVT(cp: Int): Boolean = cp >= 0x1160 && cp <= 0x11FF

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** NFC + newline canonicalization with the offset lineage. */
  def nfcWithMap(s: String): (String, OffsetMap) = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    val rawStarts = new ArrayBuffer[Int]
    val normStarts = new ArrayBuffer[Int]
    val identity = new ArrayBuffer[Boolean]

    def addSegment(rawStart: Int, ident: Boolean, repl: String): Unit = {
      // merge consecutive identity segments
      if (ident && identity.nonEmpty && identity.last &&
          rawStarts.last + (out.length() - normStarts.last) == rawStart) ()
      else { rawStarts += rawStart; normStarts += out.length(); identity += ident }
      out.append(repl)
    }

    def consumeMarks(from: Int): Int = {
      var j = from
      var done = false
      while (j < n && !done) {
        val cp = s.codePointAt(j)
        if (isMark(cp) || isJamoVT(cp)) j += Character.charCount(cp)
        else done = true
      }
      j
    }
    def startsExtender(j: Int): Boolean =
      j < n && { val cp = s.codePointAt(j); isMark(cp) || isJamoVT(cp) }

    var i = 0
    while (i < n) {
      val start = i
      val c = s.charAt(i)
      if (c == '\r') {
        i += 1
        if (i < n && s.charAt(i) == '\n') i += 1
        addSegment(start, ident = false, "\n")
      } else if (c < 0x80 && !startsExtender(start + 1)) {
        // ASCII fast path: run to the next non-ASCII or '\r', backing
        // off one char when a combining mark follows the run — that
        // last ASCII char is the mark's composition base and belongs
        // to the mark's normalizing chunk (e + U+0301 → é)
        var j = start + 1
        while (j < n && s.charAt(j) < 0x80 && s.charAt(j) != '\r') j += 1
        if (startsExtender(j)) j -= 1
        addSegment(start, ident = true, s.substring(start, j))
        i = j
      } else {
        // one base (any script, incl. ASCII-before-mark) + marks/jamo
        i += Character.charCount(s.codePointAt(i))
        i = consumeMarks(i)
        val chunk = s.substring(start, i)
        val repl = Normalizer.normalize(chunk, Normalizer.Form.NFC)
        addSegment(start, ident = repl == chunk, repl)
      }
    }
    rawStarts += n
    normStarts += out.length()
    identity += true // sentinel
    (out.toString,
      new OffsetMap(rawStarts.toArray, normStarts.toArray, identity.toArray))
  }

  /** NFC + newline canonicalization, no lineage. */
  def nfcCanonical(s: String): String = nfcWithMap(s)._1
}
