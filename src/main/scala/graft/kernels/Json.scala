package graft.kernels

import scala.collection.mutable

/** Minimal error-tolerant JSON value scanner with exact source spans —
  * the tool-payload twin of the HTML tokenizer (north star: "each
  * turn's text/tool payload is tokenized"). Extracts the VALUES
  * (not keys) of a JSON document in source order; the reference's
  * analogue is the key/value extraction feeding `key_value_area`
  * layout elements (dd_core object_types LayoutLabel).
  *
  * Never throws; on malformed input returns whatever values were
  * scanned before the damage.
  */
object Json {

  /** One extracted value: decoded text + raw source span. */
  final case class JValue(text: String, begin: Int, end: Int, isString: Boolean)

  def stringValues(s: String): List[JValue] = {
    val out = mutable.ListBuffer.empty[JValue]
    val n = s.length
    var i = 0
    var lastColon = false // value position = right after ':' or inside an array
    var inArray = List.empty[Boolean] // stack: true = array context
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '"' =>
          val (decoded, end) = scanString(s, i)
          val isValue = lastColon || inArray.headOption.contains(true)
          if (isValue) out += JValue(decoded, i, end, isString = true)
          lastColon = false
          i = end
        case ':' => lastColon = true; i += 1
        case '[' => inArray = true :: inArray; lastColon = false; i += 1
        case '{' => inArray = false :: inArray; lastColon = false; i += 1
        case ']' | '}' => inArray = inArray.drop(1); lastColon = false; i += 1
        case ',' => lastColon = false; i += 1
        case d if d == '-' || d.isDigit =>
          val st = i
          while (i < n && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
          if (lastColon || inArray.headOption.contains(true))
            out += JValue(s.substring(st, i), st, i, isString = false)
          lastColon = false
        case w if w.isWhitespace => i += 1
        case _ =>
          // true/false/null or junk
          val st = i
          while (i < n && s.charAt(i).isLetter) i += 1
          if (i == st) i += 1
          else {
            val word = s.substring(st, i)
            if ((lastColon || inArray.headOption.contains(true)) &&
                (word == "true" || word == "false" || word == "null"))
              out += JValue(word, st, i, isString = false)
            lastColon = false
          }
      }
    }
    out.toList
  }

  /** Scan a JSON string literal starting at the opening quote; returns
    * (decoded text, index after closing quote). Tolerates EOF.
    */
  private def scanString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    val n = s.length
    while (i < n && s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 5 < n =>
            try { sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6 }
            catch { case _: Exception => sb.append(c); i += 1 }
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, math.min(i + 1, n))
  }

  /** Tool-payload text: all values in source order, space-joined. */
  def toolText(payload: String): String =
    if (payload == null || payload.isEmpty || payload.indexOf('{') < 0 && payload.indexOf('[') < 0)
      ""
    else stringValues(payload).map(_.text).mkString(" ")
}
