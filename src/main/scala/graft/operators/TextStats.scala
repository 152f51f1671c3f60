package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language
  * identification, quality scoring, token counting, fingerprinting.
  *
  * Reference analogues: `LanguageDetectionService`
  * (deepdoctection/pipe/language.py:33) runs a fasttext model; here a
  * deterministic marker-count heuristic whose semantics are expressible
  * in BOTH Spark and ANSI SQL (so the DuckDB oracle can verify it
  * bit-for-bit). All pure Column expressions — codegen'd, no UDFs.
  */
object TextStats {

  /** Non-overlapping left-to-right occurrence count of `marker` in
    * `' ' || text || ' '` via replace-length arithmetic — the exact
    * semantics `replace()` has in every SQL dialect, so Spark and the
    * oracle agree by construction.
    */
  def markerCount(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(marker), ""))) / marker.length
  }

  /** SQL fragment with identical semantics (for oracles). */
  def markerCountSql(textExpr: String, marker: String): String =
    s"(length(concat(' ', $textExpr, ' ')) - length(replace(concat(' ', $textExpr, ' '), '$marker', ''))) / ${marker.length}"

  /** Language markers: tiny stopword sets per language. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a "),
    "de" -> Seq(" der ", " und "),
    "es" -> Seq(" el ", " la "),
    "fr" -> Seq(" le ", " est ")
  )

  /** Deterministic language id: argmax of marker counts; ties broken by
    * declaration order; all-zero → 'und'.
    */
  def langId(text: Column): Column = {
    val scores = Markers.map { case (lang, ms) =>
      lang -> ms.map(m => markerCount(text, m)).reduce(_ + _)
    }
    // argmax with first-wins tie-break, 'und' when max == 0
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
  }

  /** SQL equivalent of [[langId]] (DuckDB + Spark compatible). */
  def langIdSql(textExpr: String): String = {
    val scoreSql = Markers.map { case (lang, ms) =>
      lang -> ms.map(m => markerCountSql(textExpr, m)).mkString("(", " + ", ")")
    }
    val maxSql = scoreSql.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    scoreSql.foldRight("'und'") { case ((lang, s), acc) =>
      s"CASE WHEN $s = $maxSql AND $maxSql > 0 THEN '$lang' ELSE $acc END"
    }
  }

  /** Quality metrics, integer-valued for engine-exact comparison:
    * token count, mean token length ×100 (floored), stopword count,
    * and a keep/drop verdict (boilerpipe-style length gates).
    */
  /** BPE-ish token counting (task brief: "whitespace + a BPE-ish
    * regex"): the GPT-2-style pre-tokenizer pattern — contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation
    * runs. Identical regex semantics in Spark (Java regex) and DuckDB
    * (RE2): no lookarounds, POSIX-safe classes only.
    */
  val BpeTokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"""

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** DuckDB twin (single-quote-escaped pattern). */
  def bpeTokenCountSql(col: String): String =
    s"CAST(len(regexp_extract_all($col, '" +
      BpeTokenPattern.replace("'", "''") + s"')) AS INT)"

  /** THE token-count Column for every budget operator (budgetPrefix,
    * contextTrim, packSamples) — one definition so the null-text
    * convention cannot desynchronize the budgets: whitespace split by
    * default, a real tokenizer (e.g. `Bpe.countTokens`) when threaded
    * in. Null text coalesces to "" first, then counts by the active
    * counter's own rule — ONE empty token under the whitespace split,
    * ZERO under a real tokenizer ("" has no pre-tokens); never null,
    * so window sums can't undercount and typed encoders can't NPE.
    * INT-typed; callers widen as needed.
    */
  def tokenCountCol(counter: Option[String => Int], text: Column): Column =
    counter match {
      case None => size(split(coalesce(text, lit("")), " "))
      case Some(f) =>
        val u = udf((s: String) => f(if (s == null) "" else s))
        u(text).cast("int")
    }

  def quality(df: DataFrame, textCol: String): DataFrame = {
    val toks = size(split(col(textCol), " "))
    val meanLen100 = floor((length(col(textCol)) - toks + 1) * 100 / toks).cast("long")
    val stop = Markers.flatMap(_._2).map(m => markerCount(col(textCol), m)).reduce(_ + _)
    df.select(
      col("doc_id"),
      toks.cast("int").as("n_tokens"),
      meanLen100.as("mean_token_len_x100"),
      stop.cast("int").as("n_stopwords"),
      (toks >= 10 && toks <= 1000 && meanLen100 >= 200 && meanLen100 <= 1200).as("quality_ok"))
  }

  val QualitySqlSelect: String = {
    val toks = "length(string_split(text, ' '))"
    val meanLen = s"CAST(floor((length(text) - $toks + 1) * 100 / $toks) AS BIGINT)"
    val stop = Markers.flatMap(_._2).map(m => markerCountSql("text", m)).mkString(" + ")
    s"""SELECT doc_id, CAST($toks AS INT) AS n_tokens, $meanLen AS mean_token_len_x100,
       CAST($stop AS INT) AS n_stopwords,
       ($toks >= 10 AND $toks <= 1000 AND $meanLen >= 200 AND $meanLen <= 1200) AS quality_ok
       FROM documents"""
  }

  /** Scala twin of [[markerCount]] — same replace-count semantics
    * (non-overlapping, left-to-right), for use inside row kernels.
    */
  def markerCountScala(text: String, marker: String): Int = {
    val padded = " " + text + " "
    var i = padded.indexOf(marker)
    var n = 0
    while (i >= 0) { n += 1; i = padded.indexOf(marker, i + marker.length) }
    n
  }

  /** Scala twin of [[langId]]: argmax of marker counts, first-wins
    * tie-break in [[Markers]] order, 'und' when all zero.
    */
  def langIdScala(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    // pad ONCE — markerCountScala pads internally, so the naive map
    // was copying the whole text once per marker (8× per turn on the
    // extraction hot path). Same counts, same first-wins argmax.
    val padded = " " + text + " "
    var bestLang = "und"
    var best = 0
    val it = Markers.iterator
    while (it.hasNext) {
      val (lang, ms) = it.next()
      var s = 0
      val mit = ms.iterator
      while (mit.hasNext) {
        val m = mit.next()
        var i = padded.indexOf(m)
        while (i >= 0) { s += 1; i = padded.indexOf(m, i + m.length) }
      }
      if (s > best) { best = s; bestLang = lang }
    }
    bestLang
  }

  /** Rolling polynomial fingerprint over tokens (document
    * fingerprinting for near-dup bucketing): h = (h*31 + tokenHash)
    * mod p. Pure Scala kernel, unit-tested; the md5 variant
    * (q_fingerprint) is the SQL-oracle-able one.
    */
  def rollingFingerprint(tokens: Iterable[String], p: Long = 1000000007L): Long = {
    var h = 0L
    for (t <- tokens) {
      var th = 0L
      var i = 0
      while (i < t.length) { th = (th * 131 + t.charAt(i)) % p; i += 1 }
      h = (h * 31 + th) % p
    }
    h
  }

  /** PII-style scrubbing (the C4/CCNet-style regex redaction pass a
    * training-data pipeline runs before publishing): email and
    * phone-number spans replaced by typed placeholders. Both patterns
    * are RE2-safe (no lookarounds, no backrefs) so Spark (Java regex)
    * and DuckDB (RE2) produce identical spans; emails are redacted
    * FIRST and phones counted on the email-redacted text, making the
    * order part of the contract. Pure Column expressions — codegen'd,
    * scales as a map-only stage.
    */
  val EmailRe: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe: String = """\+?[0-9][0-9()\- ]{6,}[0-9]"""

  def redactEmails(text: Column): Column =
    regexp_replace(text, lit(EmailRe), lit("<EMAIL>"))

  def redactPii(text: Column): Column =
    regexp_replace(redactEmails(text), lit(PhoneRe), lit("<PHONE>"))

  def redact(df: DataFrame, textCol: String): DataFrame =
    df.select(col("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(redactEmails(col(textCol)), lit(PhoneRe), lit(0)))
        .as("n_phones"),
      redactPii(col(textCol)).as("redacted"))

  /** DuckDB expression for the fully-redacted string (emails first,
    * then phones — the order is part of the contract).
    */
  def redactedSqlExpr(textExpr: String): String = {
    def q(p: String) = p.replace("'", "''")
    s"regexp_replace(regexp_replace($textExpr, '${q(EmailRe)}', '<EMAIL>', 'g'), '${q(PhoneRe)}', '<PHONE>', 'g')"
  }

  /** DuckDB twin of [[redact]] over a `t2` text column. */
  def redactSqlSelect(textExpr: String): String = {
    def q(p: String) = p.replace("'", "''")
    s"""CAST(len(regexp_extract_all($textExpr, '${q(EmailRe)}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(regexp_replace($textExpr, '${q(EmailRe)}', '<EMAIL>', 'g'), '${q(PhoneRe)}')) AS INT) AS n_phones,
       ${redactedSqlExpr(textExpr)} AS redacted"""
  }

  /** Gopher quality heuristics (Rae et al. 2021 appendix A1.1,
    * public). The reference pipeline's quality gate is a model
    * (fasttext); these are the published rule-based filters every
    * large-scale training-data pipeline runs first. Rules, with the
    * paper's thresholds:
    *
    *   - word count in [50, 100000]
    *   - mean word length in [3, 10] characters
    *   - symbol-to-word ratio <= 0.1 for EACH of '#' and '...'
    *     (separate ratios per symbol, as published — a doc at 6% of
    *     each passes; a combined 10% test would wrongly drop it)
    *   - fraction of lines starting with a bullet ('- ') <= 0.9
    *   - fraction of lines ending with an ellipsis ('...') <= 0.3
    *   - fraction of words containing an alphabetic char >= 0.8
    *   - at least 2 occurrences of the 8-word English stop list
    *     (occurrence-count semantics, as in the public DataTrove
    *     reproduction — word-equality matches, not substring)
    *
    * Every metric is an exact integer and the verdict cross-multiplies
    * (e.g. `n_sym*10 <= n_words`), so no float division exists on
    * either engine and the oracle comparison is hash-exact. Words are
    * the space-split of the newline-flattened text; lines are the
    * newline-split. Pure Column expressions — map-only, codegen'd; a
    * 100 TB corpus pays zero exchange for this gate.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  final case class GopherCols(nWords: Column, wordChars: Column,
      nLines: Column, nHashSym: Column, nEllipsisSym: Column,
      nBullet: Column, nEllipsis: Column, nAlpha: Column, nStop: Column) {
    def ok: Column =
      nWords >= 50 && nWords <= 100000 &&
        wordChars >= nWords.cast("long") * 3 &&
        wordChars <= nWords.cast("long") * 10 &&
        nHashSym * 10 <= nWords &&
        nEllipsisSym * 10 <= nWords &&
        nBullet * 10 <= nLines * 9 &&
        nEllipsis * 10 <= nLines * 3 &&
        nAlpha * 5 >= nWords * 4 &&
        nStop >= 2
  }

  def gopherCols(t: Column): GopherCols = {
    val ws = split(translate(t, "\n", " "), " ")
    val lines = split(t, "\n")
    val stopArr = array(GopherStopwords.map(lit): _*)
    GopherCols(
      nWords = size(ws),
      wordChars = aggregate(ws, lit(0L), (a, w) => a + length(w)),
      nLines = size(lines),
      nHashSym = markerCount(t, "#").cast("int"),
      nEllipsisSym = markerCount(t, "...").cast("int"),
      nBullet = size(filter(lines, l => l.like("- %"))),
      nEllipsis = size(filter(lines, l => l.like("%..."))),
      nAlpha = size(filter(ws, w => w.rlike("[A-Za-z]"))),
      nStop = size(filter(ws, w => array_contains(stopArr, w))))
  }

  def gopher(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = gopherCols(col(textCol))
    df.select(col(idCol).as("doc_id"),
      g.nWords.as("n_words"),
      g.wordChars.as("word_chars"),
      g.nLines.as("n_lines"),
      g.nHashSym.as("n_hash_sym"),
      g.nEllipsisSym.as("n_ellipsis_sym"),
      g.nBullet.as("n_bullet_lines"),
      g.nEllipsis.as("n_ellipsis_lines"),
      g.nAlpha.as("n_alpha_words"),
      g.nStop.as("n_stopwords"),
      g.ok.as("gopher_ok"))
  }

  /** DuckDB twin of [[gopher]]: metric expressions over a text column,
    * assembled as inner-metrics + outer-verdict so each metric is
    * written once. `fromSql` must yield (doc_id, <textExpr>).
    */
  def gopherSqlSelect(textExpr: String, fromSql: String): String = {
    val flat = s"replace($textExpr, chr(10), ' ')"
    val ws = s"string_split($flat, ' ')"
    val lines = s"string_split($textExpr, chr(10))"
    val stopList = GopherStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, n_words, word_chars, n_lines, n_hash_sym,
          n_ellipsis_sym, n_bullet_lines,
          n_ellipsis_lines, n_alpha_words, n_stopwords,
          (n_words >= 50 AND n_words <= 100000
           AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
           AND n_hash_sym * 10 <= n_words
           AND n_ellipsis_sym * 10 <= n_words
           AND n_bullet_lines * 10 <= n_lines * 9
           AND n_ellipsis_lines * 10 <= n_lines * 3
           AND n_alpha_words * 5 >= n_words * 4
           AND n_stopwords >= 2) AS gopher_ok
        FROM (SELECT doc_id,
          CAST(len($ws) AS INT) AS n_words,
          CAST(COALESCE(list_sum(list_transform($ws, w -> length(w))), 0) AS BIGINT) AS word_chars,
          CAST(len($lines) AS INT) AS n_lines,
          CAST(${markerCountSql(textExpr, "#")} AS INT) AS n_hash_sym,
          CAST(${markerCountSql(textExpr, "...")} AS INT) AS n_ellipsis_sym,
          CAST(len(list_filter($lines, l -> l LIKE '- %')) AS INT) AS n_bullet_lines,
          CAST(len(list_filter($lines, l -> l LIKE '%...')) AS INT) AS n_ellipsis_lines,
          CAST(len(list_filter($ws, w -> regexp_matches(w, '[A-Za-z]'))) AS INT) AS n_alpha_words,
          CAST(len(list_filter($ws, w -> list_contains($stopList, w))) AS INT) AS n_stopwords
        FROM ($fromSql))"""
  }

  /** C4-style line/document cleaning (Raffel et al. 2020 §2.2,
    * public): keep only lines that end in a terminal punctuation mark
    * ('.', '!', '?', '"'), contain at least 5 words, and do not
    * mention "javascript"; drop the whole document when it contains a
    * curly brace or the phrase "lorem ipsum", or when fewer than 3
    * lines survive (the paper discards pages with fewer than 3
    * sentences and retains lines of at least 5 words; this corpus is
    * line-oriented so the kept-line count is the sentence proxy).
    * Matching is literal lowercase — the synthetic corpus is
    * lowercase, so this equals the paper's case-folded match
    * deterministically.
    *
    * All Column expressions over the line array — map-only, no
    * shuffle; the kept text is reassembled in original line order.
    */
  def c4Filter(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, l =>
      (l.like("%.") || l.like("%!") || l.like("%?") || l.like("%\"")) &&
        size(split(l, " ")) >= 5 &&
        !l.like("%javascript%"))
    val nKept = size(kept)
    val docKept = nKept >= 3 && !t.like("%{%") && !t.like("%lorem ipsum%")
    df.select(col(idCol).as("doc_id"),
      size(lines).as("n_lines"),
      nKept.as("n_kept"),
      docKept.as("doc_kept"),
      when(docKept, array_join(kept, "\n")).otherwise(lit("")).as("final_text"))
  }

  /** DuckDB twin of [[c4Filter]] — same rules re-derived with list
    * lambdas. `fromSql` must yield (doc_id, <textExpr>).
    */
  def c4FilterSqlSelect(textExpr: String, fromSql: String): String = {
    val lines = s"string_split($textExpr, chr(10))"
    val kept = s"""list_filter($lines, l ->
        (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
        AND len(string_split(l, ' ')) >= 5
        AND NOT l LIKE '%javascript%')"""
    s"""SELECT doc_id, n_lines, n_kept, doc_kept,
          CASE WHEN doc_kept THEN kept_text ELSE '' END AS final_text
        FROM (SELECT doc_id,
          CAST(len($lines) AS INT) AS n_lines,
          CAST(len($kept) AS INT) AS n_kept,
          (len($kept) >= 3 AND NOT $textExpr LIKE '%{%'
            AND NOT $textExpr LIKE '%lorem ipsum%') AS doc_kept,
          array_to_string($kept, chr(10)) AS kept_text
        FROM ($fromSql))"""
  }

  /** Gopher-style repetition signals (Rae et al. 2021 appendix A1.1,
    * public): duplicate-"line" and duplicated/top word-n-gram
    * character counts. All outputs are exact integer NUMERATORS with
    * `total_chars` the shared denominator, so the engine comparison
    * is hash-exact and the keep/drop verdict cross-multiplies instead
    * of dividing. "Lines" are 8-word chunks (the transcript corpus is
    * single-line, so literal newline splitting would be vacuous);
    * n-grams are word n-grams joined by ' ' and their char length
    * includes the joining spaces. Overlapping duplicated n-gram
    * occurrences each count their full length, so `dup5_chars` can
    * EXCEED `total_chars` — it is a repetition signal, not a true
    * fraction (same in both engines by construction).
    *
    * Scale design: every metric is computed inside one row — no
    * explode, no shuffle; a 100 TB corpus pays zero exchange. (The
    * declarative alternative — explode n-grams + groupBy(doc, gram) —
    * shuffles ~7× the corpus text.)
    */
  final case class Repetition(n_words: Int, n_lines: Long,
      n_distinct_lines: Long, dup_line_chars: Long, top2_chars: Long,
      dup5_chars: Long, total_chars: Long, repetition_ok: Boolean)

  def repetitionMetrics(text: String): Repetition = {
    // char counts are Unicode CODE POINTS (what Spark SQL length()
    // and DuckDB length() both count) — String.length would diverge
    // on non-BMP text (2 UTF-16 units per astral char)
    def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
    val ws = text.split(" ", -1)
    val n = ws.length
    def gramStats(k: Int): (Long, Long) = {
      // (max cnt*len, sum of cnt*len over grams with cnt > 1)
      val counts = new java.util.HashMap[String, Int]()
      var i = 0
      while (i + k <= n) {
        val g = ws.slice(i, i + k).mkString(" ")
        counts.merge(g, 1, Integer.sum)
        i += 1
      }
      var top = 0L
      var dup = 0L
      counts.forEach { (g, c) =>
        val chars = c.toLong * cpLen(g)
        if (chars > top) top = chars
        if (c > 1) dup += chars
      }
      (top, dup)
    }
    val lineCounts = new java.util.HashMap[String, Int]()
    val nLines = (n + 7) / 8
    var j = 0
    while (j < nLines) {
      lineCounts.merge(ws.slice(j * 8, math.min(j * 8 + 8, n)).mkString(" "),
        1, Integer.sum)
      j += 1
    }
    var dupLineChars = 0L
    lineCounts.forEach { (l, c) => if (c > 1) dupLineChars += c.toLong * cpLen(l) }
    val (top2, _) = gramStats(2)
    val (_, dup5) = gramStats(5)
    val total = cpLen(text)
    Repetition(n, nLines.toLong, lineCounts.size.toLong, dupLineChars,
      top2, dup5, total,
      dupLineChars * 5 <= total && top2 * 5 <= total && dup5 * 5 <= total)
  }
}
