package graft.model

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic content-derived ids — RFC 4122 version-3 (MD5) UUIDs,
  * byte-compatible with Python's `uuid.uuid3(uuid.NAMESPACE_DNS, s)` as
  * used by the reference (dd_core/utils/identifier.py:53-77,
  * dd_core/datapoint/annotation.py:354-376). Content-derived ids make
  * outputs reproducible across runs and cluster sizes.
  */
object Ids {
  // uuid.NAMESPACE_DNS = 6ba7b810-9dad-11d1-80b4-00c04fd430c8
  private val NamespaceDns: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8
  ).map(_.toByte)

  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** identifier.py:53 `get_uuid_from_str`. */
  def uuid3(s: String): String = {
    val md = mdPool.get()
    md.reset()
    md.update(NamespaceDns)
    md.update(s.getBytes(StandardCharsets.UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x30).toByte // version 3
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val out = new Array[Char](36)
    var i = 0
    var p = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) { out(p) = '-'; p += 1 }
      val v = h(i) & 0xff
      out(p) = Hex(v >>> 4); out(p + 1) = Hex(v & 0xf)
      p += 2
      i += 1
    }
    new String(out)
  }

  private val Hex: Array[Char] = "0123456789abcdef".toCharArray

  /** identifier.py:66 `get_uuid` — uuid3 of concatenated inputs. */
  def uuid3(inputs: String*): String = uuid3(inputs.mkString(""))

  private def hexDigest(md: MessageDigest): String = {
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x30).toByte
    h(8) = ((h(8) & 0x3f) | 0x80).toByte
    val out = new Array[Char](36)
    var i = 0
    var p = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) { out(p) = '-'; p += 1 }
      val v = h(i) & 0xff
      out(p) = Hex(v >>> 4); out(p + 1) = Hex(v & 0xf)
      p += 2
      i += 1
    }
    new String(out)
  }

  /** Per-turn annotation-id factory: hoists the namespace + turnId
    * bytes and the digest instance out of the per-word loop, and
    * streams `kind + begin + "_" + end` into the digest without
    * building the concatenated string. UTF-8 of a concatenation equals
    * the concatenation of UTF-8, so ids are byte-identical to
    * [[annId]] (IdsSpec pins the CPython vectors).
    */
  final class AnnIdBuilder(turnId: String) {
    private val md = MessageDigest.getInstance("MD5")
    // the whole message is assembled into ONE reusable buffer and fed
    // to the digest in a single update: the previous per-piece updates
    // (namespace, turnId, kind, digits, '_', digits — six engineUpdate
    // calls of a few bytes each) spent more time in the digest's
    // buffer management than in the compression itself (measured).
    // Bytes are identical — UTF-8 of a concatenation IS the
    // concatenation of UTF-8 (IdsSpec pins the CPython vectors).
    private var buf: Array[Byte] = _
    private val prefixLen: Int = {
      val t = turnId.getBytes(StandardCharsets.UTF_8)
      buf = new Array[Byte](16 + t.length + 64)
      System.arraycopy(NamespaceDns, 0, buf, 0, 16)
      System.arraycopy(t, 0, buf, 16, t.length)
      16 + t.length
    }

    private def ensure(n: Int): Unit =
      if (n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(n, buf.length * 2))

    /** Append v's decimal digits at `at`; returns the new end offset. */
    private def putInt(v: Int, at: Int): Int = {
      // widen before negating: -Int.MinValue overflows back to itself,
      // which would skip the digit loop and emit only "-"
      var x = v.toLong
      var p = at
      if (x == 0) { buf(p) = '0'; return p + 1 }
      val neg = x < 0
      if (neg) { buf(p) = '-'; p += 1; x = -x }
      val start = p
      while (x > 0) { buf(p) = ('0' + x % 10).toByte; p += 1; x /= 10 }
      // digits were emitted lowest-first — reverse in place
      var lo = start
      var hi = p - 1
      while (lo < hi) {
        val t = buf(lo); buf(lo) = buf(hi); buf(hi) = t
        lo += 1; hi -= 1
      }
      p
    }

    def annId(kind: String, begin: Int, end: Int): String = {
      val kb = kind.getBytes(StandardCharsets.UTF_8)
      ensure(prefixLen + kb.length + 23) // 2×(sign+10 digits) + '_'
      var p = prefixLen
      System.arraycopy(kb, 0, buf, p, kb.length)
      p += kb.length
      p = putInt(begin, p)
      buf(p) = '_'
      p = putInt(end, p + 1)
      md.reset()
      md.update(buf, 0, p)
      hexDigest(md)
    }
  }

  /** image.py:373-388 analogue: stable id of one turn. */
  def turnId(convId: String, turnIdx: Int): String = uuid3(convId + "#" + turnIdx)

  /** annotation.py:354-376 analogue: block/word id from defining
    * attributes + container context.
    */
  def annId(turnId: String, kind: String, begin: Int, end: Int): String =
    uuid3(turnId + kind + begin + "_" + end)
}
