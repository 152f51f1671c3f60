package graft.operators

/** `LMTokenClassifierService` plumbing (deepdoctection/pipe/lm.py:40,
  * serve :175): the reference runs a transformer over a turn's words
  * and stores each word's TOKEN_CLASS sub-category. Model inference is
  * out of scope for this sandbox (no weights, no torch), but the
  * SERVICE is not the model: it is "apply a word→class function inside
  * the pipeline and carry the result on the word row". That slot is
  * real here — `ExtractConfig.tokenClassifier` takes any
  * `String => String` (a user plugs a quantized model callable or an
  * external scorer the same way), and this object ships a
  * deterministic rule-based stand-in whose SQL twin lets the driver
  * oracle the whole path end to end.
  */
object Lm {

  /** Rule-based token classes, defined so the Scala and SQL versions
    * are identical by construction (ASCII digit test, no lookahead —
    * RE2-safe in both engines): all-digits → number, any digit →
    * alnum, single char → single, else word.
    */
  def heuristicTokenClass(w: String): String = {
    var digits = 0
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      i += 1
    }
    if (w.nonEmpty && digits == w.length) "number"
    else if (digits > 0) "alnum"
    else if (w.length == 1) "single"
    else "word"
  }

  /** The DuckDB oracle twin of [[heuristicTokenClass]] (anchored
    * regexp_matches = full match).
    */
  def heuristicTokenClassSql(col: String): String =
    s"""CASE WHEN regexp_matches($col, '^[0-9]+$$') THEN 'number'
        WHEN regexp_matches($col, '[0-9]') THEN 'alnum'
        WHEN length($col) = 1 THEN 'single'
        ELSE 'word' END"""

  /** Page-level stand-in for the sequence-classifier slot
    * (`LMSequenceClassifierService`, pipe/lm.py:289) — same
    * SQL-twinnable design as [[heuristicTokenClass]]: empty → empty,
    * any ASCII digit → report, long → longform, else note. All tests
    * are BMP-safe so Scala's UTF-16 `length` and DuckDB's codepoint
    * `length` agree on this corpus.
    */
  def heuristicSeqClass(text: String): String = {
    if (text.isEmpty) "empty"
    else {
      var digits = false
      var i = 0
      while (i < text.length && !digits) {
        val c = text.charAt(i)
        if (c >= '0' && c <= '9') digits = true
        i += 1
      }
      if (digits) "report"
      else if (text.length > 120) "longform"
      else "note"
    }
  }

  /** The DuckDB oracle twin of [[heuristicSeqClass]]. */
  def heuristicSeqClassSql(col: String): String =
    s"""CASE WHEN $col = '' THEN 'empty'
        WHEN regexp_matches($col, '[0-9]') THEN 'report'
        WHEN length($col) > 120 THEN 'longform'
        ELSE 'note' END"""
}
