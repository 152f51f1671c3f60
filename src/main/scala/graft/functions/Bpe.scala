package graft.functions

/** Real byte-pair-encoding merge loop — merged tokens, not pre-tokens.
  *
  * The standard algorithm (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"; the GPT-2 reference
  * encoder's published `bpe()` shape): split a pre-token into single
  * characters (leading space mapped to the GPT-2 'Ġ' marker), then
  * repeatedly merge every occurrence of the LOWEST-RANKED adjacent
  * pair until no adjacent pair has a rank. The merge table is the
  * committed public-format `graft/bpe/merges.txt` (one ranked pair per
  * line, earlier = higher priority — GPT-2 merges.txt format).
  *
  * Text-level counting composes with the GPT-2-style pre-tokenizer
  * already oracled as `q_token_count_bpe`
  * (TextStats.BpeTokenPattern): each regex piece runs the merge loop,
  * the text's count is the sum. This makes token budgets REAL — the
  * budget operators (budgetPrefix, packSamples, contextTrim) accept
  * this counter and then budget in merged tokens instead of pre-token
  * approximations.
  *
  * Externally anchored: `tools/make_bpe_fixtures.py` re-implements the
  * loop independently in Python (zero shared code) and writes
  * `src/test/resources/bpe/token_counts.json`; BpeSpec asserts
  * sequence-exact parity over the committed fixture vocabulary, and
  * the q_token_count_bpe_merged / q_token_budget_bpe oracles embed the
  * Python-derived counts as VALUES.
  */
object Bpe extends Serializable {

  /** GPT-2 byte-encoder space marker. */
  final val SpaceMark = "Ġ" // Ġ

  /** Ranked merge pairs from the committed merges.txt; loaded once per
    * JVM (executors each read it from the jar/classpath — a few
    * hundred bytes, no driver shipping needed).
    */
  lazy val ranks: Map[(String, String), Int] = loadRanks("/graft/bpe/merges.txt")

  def loadRanks(resource: String): Map[(String, String), Int] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing BPE merge table resource $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex
      .map { case (l, i) =>
        val sp = l.split(' ')
        require(sp.length == 2, s"malformed merge line '$l'")
        ((sp(0), sp(1)), i)
      }
      .toMap
    finally src.close()
  }

  /** The merge loop on ONE pre-token. Each iteration scans the current
    * symbol sequence for the lowest-ranked adjacent pair, then merges
    * ALL its occurrences left-to-right (the reference encoder's
    * behavior). Iterations are bounded by the symbol count — each
    * merge shortens the sequence, so a pre-token of n chars loops at
    * most n−1 times.
    */
  def encode(pretoken: String): Vector[String] = {
    var symbols: Vector[String] =
      pretoken.iterator.map(c => if (c == ' ') SpaceMark else c.toString).toVector
    var done = symbols.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      var bestA: String = null
      var bestB: String = null
      while (i < symbols.length - 1) {
        val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestA = symbols(i); bestB = symbols(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val merged = Vector.newBuilder[String]
        var k = 0
        while (k < symbols.length) {
          if (k + 1 < symbols.length && symbols(k) == bestA && symbols(k + 1) == bestB) {
            merged += symbols(k) + symbols(k + 1)
            k += 2
          } else {
            merged += symbols(k)
            k += 1
          }
        }
        symbols = merged.result()
        if (symbols.length <= 1) done = true
      }
    }
    symbols
  }

  private lazy val preTokenRe = graft.operators.TextStats.BpeTokenPattern.r

  /** Merged-token count of a text (null-safe: null/"" → 0). */
  def countTokens(text: String): Int =
    if (text == null || text.isEmpty) 0
    else preTokenRe.findAllIn(text).map(encode(_).length).sum
}
