package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.kernels.{Html, Order, Segment, Table}
import graft.model.{BBox, Turn}
import graft.pipeline.Extract

/** ScalaCheck properties protecting the north-rule invariant —
  * coverage the reference's fixture-only suite lacks (SURVEY §5).
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampler (the scalatest-scalacheck bridge is not in
    * the offline cache): evaluates the property on `n` seeded samples.
    */
  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val payloadGen: Gen[String] = {
    val junk = Gen.oneOf("<", ">", "&", "&amp;", "<p>", "</p>", "<div>", "</div>",
      "<table>", "<tr>", "<td>", "</td>", "<nav>", "</nav>", "<br>", "<!-- c -->",
      "<script>x<y</script>", "\n", "\n\n", " ", "\t")
    val word = Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty)
    Gen.listOf(Gen.frequency(4 -> word, 2 -> junk)).map(_.mkString(" ")).map(_.take(2000))
  }

  test("extraction never throws and is deterministic on arbitrary payloads") {
    forAll(payloadGen) { payload =>
      val t = Turn("c", 0, "user", payload, "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      val a = Extract.extractTurn(t)
      val b = Extract.extractTurn(t)
      assert(a.extractedText == b.extractedText)
      assert(a.blocks.toList == b.blocks.toList)
      assert(!a.metrics.parseFailed || a.extractedText.isEmpty)
    }
  }

  test("word spans always slice the raw payload to the emitted word") {
    forAll(payloadGen) { payload =>
      for (b <- Segment.segment(payload).blocks; w <- b.words) {
        assert(graft.kernels.Normalize.nfc(
          Html.decodeEntities(payload.substring(w.begin, w.end))) == w.text)
      }
    }
  }

  test("tokenizer events cover disjoint, in-bounds, ordered ranges") {
    forAll(payloadGen) { payload =>
      val evs = Html.tokenize(payload)
      var last = 0
      for (e <- evs) {
        assert(e.begin >= 0 && e.end <= payload.length && e.begin <= e.end)
        assert(e.begin >= last || e.isInstanceOf[Html.EndTag])
        last = math.max(last, e.end)
      }
    }
  }

  private val boxesGen: Gen[List[(String, BBox)]] =
    Gen.choose(1, 8).flatMap { n =>
      Gen.sequence[List[(String, BBox)], (String, BBox)]((0 until n).map { i =>
        for {
          col <- Gen.choose(0, 1)
          y <- Gen.choose(0, 900)
          h <- Gen.choose(20, 80)
          w <- Gen.choose(100, 400)
        } yield (s"b$i", BBox(col * 500.0, y.toDouble, col * 500.0 + w, (y + h).toDouble, absCoords = true))
      }.toList)
    }

  test("reading order is a permutation-invariant total order") {
    forAll(boxesGen) { boxes =>
      val base = Order.orderBlocks(boxes, 1000, 1000)
      assert(base.map(_._1).sorted == (1 to boxes.length).toList)
      val shuffled = scala.util.Random.shuffle(boxes)
      assert(Order.orderBlocks(shuffled, 1000, 1000).toMap == base.toMap.map(identity))
    }
  }

  test("table csv dimensions always match nRows x nCols; html parses back") {
    val gridGen = for {
      r <- Gen.choose(1, 4); c <- Gen.choose(1, 4)
    } yield (r, c, (1 to r).map(i => (1 to c).map(j => s"v$i$j").mkString("<td>", "</td><td>", "</td>"))
      .mkString("<table><tr>", "</tr><tr>", "</tr></table>"))
    forAll(gridGen) { case (r, c, markup) =>
      val List(t) = Table.parseTables(markup)
      assert(t.nRows == r && t.nCols == c)
      assert(t.csv.length == r && t.csv.forall(_.length == c))
      val List(t2) = Table.parseTables(t.html)
      assert(t2.cells.map(x => (x.row, x.col, x.text)).toList ==
        t.cells.map(x => (x.row, x.col, x.text)).toList)
    }
  }
}

/** Properties of the normalization + offset-lineage kernel. */
/** Property anchors for the round-6 text operators: the optimized
  * HashMap kernels vs naive quadratic re-derivations, incl. non-BMP
  * (astral) characters where UTF-16 unit counting would diverge from
  * the code-point semantics both SQL engines use.
  */
class TextOpsPropertySpec extends AnyFunSuite {
  import graft.operators.{Corpus, TextStats}

  private def forAll[A](gen: Gen[A], n: Int = 80)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(1042L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // small vocabulary (forces duplicates) + an astral-char word
  private val wordGen: Gen[String] =
    Gen.oneOf("a", "bb", "ccc", "dd", "e", "😀ok", "ffff")
  private val textGen: Gen[String] =
    Gen.listOf(wordGen).map(_.take(40).mkString(" "))

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  test("repetitionMetrics equals a naive quadratic re-derivation") {
    forAll(textGen) { text =>
      val m = TextStats.repetitionMetrics(text)
      val ws = text.split(" ", -1)
      val lines = ws.grouped(8).map(_.mkString(" ")).toSeq
      assert(m.n_words == ws.length)
      assert(m.n_lines == lines.length.max(1)) // "" → one empty line
      val lineGroups = lines.groupBy(identity)
      assert(m.n_distinct_lines == lineGroups.size.max(1))
      assert(m.dup_line_chars == lineGroups.collect {
        case (l, g) if g.size > 1 => g.size.toLong * cp(l) }.sum)
      val bigrams = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val topNaive = bigrams.groupBy(identity)
        .map { case (g, o) => o.size.toLong * cp(g) }.maxOption.getOrElse(0L)
      assert(m.top2_chars == topNaive)
      val fives = ws.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSeq
      val dupNaive = fives.groupBy(identity).collect {
        case (g, o) if o.size > 1 => o.size.toLong * cp(g) }.sum
      assert(m.dup5_chars == dupNaive)
      assert(m.total_chars == cp(text))
    }
  }

  test("redaction placeholders cannot re-match: scrub is idempotent") {
    // <EMAIL>/<PHONE> contain no '@' and no digit, so a second pass
    // finds nothing new — java-regex side; the RE2 twin shares the
    // patterns so the argument transfers
    val piiGen: Gen[String] = Gen.listOf(Gen.oneOf(
      "x@y.com", "a.b@c-d.org", "+1 555-0100", "(12) 3456-7890",
      "word", "a@b", "12345", "@", "+")).map(_.take(12).mkString(" "))
    forAll(piiGen) { text =>
      def scrub(s: String): String = s
        .replaceAll(TextStats.EmailRe, "<EMAIL>")
        .replaceAll(TextStats.PhoneRe, "<PHONE>")
      val once = scrub(text)
      assert(scrub(once) == once)
      assert(!once.matches(s".*${TextStats.EmailRe}.*"))
    }
  }

  // --- Column-kernel parity: gopher + c4Filter vs plain-Scala naive
  // derivations on random multi-line texts. The Column kernels use
  // split/LIKE/rlike/aggregate HOFs whose edge semantics (trailing
  // empties, zero-width LIKE matches, code-point length) are exactly
  // what these naive twins pin down.

  private val gopherWordGen: Gen[String] = Gen.frequency(
    (6, Gen.oneOf("data", "word", "x", "wordwordword", "12345", "😀ok")),
    (3, Gen.oneOf(TextStats.GopherStopwords)),
    (1, Gen.oneOf("#", "x...", "...", "them", "-")))
  private val lineGen: Gen[String] = for {
    bullet <- Gen.frequency((4, Gen.const("")), (1, Gen.const("- ")))
    ws <- Gen.listOf(gopherWordGen).map(_.take(12))
    punct <- Gen.frequency((3, Gen.const("")),
      (1, Gen.oneOf(".", "!", "?", "\"", "...")),
      (1, Gen.oneOf(" javascript.", " { x.", " lorem ipsum.")))
  } yield bullet + ws.mkString(" ") + punct
  private val multilineGen: Gen[String] =
    Gen.listOf(lineGen).map(_.take(8).mkString("\n"))

  private def naiveGopher(t: String): (Int, Long, Int, Int, Int, Int, Int, Int, Int, Boolean) = {
    val ws = t.replace('\n', ' ').split(" ", -1)
    val lines = t.split("\n", -1)
    val nWords = ws.length
    val wordChars = ws.map(cp).sum
    val nHash = TextStats.markerCountScala(t, "#")
    val nEllSym = TextStats.markerCountScala(t, "...")
    val nBullet = lines.count(_.startsWith("- "))
    val nEll = lines.count(_.endsWith("..."))
    val nAlpha = ws.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
    val nStop = ws.count(TextStats.GopherStopwords.contains)
    val ok = nWords >= 50 && nWords <= 100000 &&
      wordChars >= nWords.toLong * 3 && wordChars <= nWords.toLong * 10 &&
      nHash * 10 <= nWords && nEllSym * 10 <= nWords &&
      nBullet * 10 <= lines.length * 9 && nEll * 10 <= lines.length * 3 &&
      nAlpha * 5 >= nWords * 4 && nStop >= 2
    (nWords, wordChars, lines.length, nHash, nEllSym, nBullet, nEll, nAlpha, nStop, ok)
  }

  test("gopher Column kernel equals the naive Scala derivation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    forAll(multilineGen, 120)(texts += _)
    val rows = TextStats.gopher(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "t"),
        "doc_id", "t")
      .orderBy("doc_id").collect()
    rows.zip(texts).foreach { case (r, t) =>
      val n = naiveGopher(t)
      val got = (r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5),
        r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9), r.getBoolean(10))
      assert(got == n, s"text=<$t>")
    }
  }

  test("c4Filter Column kernel equals the naive Scala derivation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    forAll(multilineGen, 120)(texts += _)
    val rows = TextStats.c4Filter(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "t"),
        "doc_id", "t")
      .orderBy("doc_id").collect()
    rows.zip(texts).foreach { case (r, t) =>
      val lines = t.split("\n", -1)
      val kept = lines.filter(l =>
        (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
          l.split(" ", -1).length >= 5 && !l.contains("javascript"))
      val docKept = kept.length >= 3 && !t.contains("{") && !t.contains("lorem ipsum")
      val finalText = if (docKept) kept.mkString("\n") else ""
      val got = (r.getInt(1), r.getInt(2), r.getBoolean(3), r.getString(4))
      assert(got == ((lines.length, kept.length, docKept, finalText)), s"text=<$t>")
    }
  }

  test("dupSpanCoverage equals a brute-force interval-union derivation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val vocab = Array("a", "b", "c")
    for (trial <- 1 to 5) {
      val k = 2 + trial % 2 // k = 3, 2, 3, 2, 3
      val corpus = (0 until 8).map { id =>
        (id.toLong, Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(3))).mkString(" "))
      }
      // brute force: global gram counts, then per-doc covered set
      val occ = corpus.flatMap { case (id, t) =>
        val ws = t.split(" ", -1)
        (0 to ws.length - k).map(i => (id, i, ws.slice(i, i + k).mkString(" ")))
      }
      val counts = occ.groupBy(_._3).view.mapValues(_.size).toMap
      val expected = corpus.map { case (id, t) =>
        val n = t.split(" ", -1).length
        val covered = occ.filter(o => o._1 == id && counts(o._3) >= 2)
          .flatMap(o => o._2 until o._2 + k).toSet
        (id, n, covered.size.toLong, covered.size.toLong * 10000 / n,
          covered.size.toLong * 5 >= n)
      }.sortBy(_._1)
      val got = Corpus.dupSpanCoverage(corpus.toDF("doc_id", "t"), "doc_id", "t", k)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .toSeq
      assert(got == expected, s"trial=$trial k=$k corpus=$corpus")
    }
  }
}

class NormalizePropertySpec extends AnyFunSuite {
  import graft.kernels.Normalize
  import org.scalacheck.Gen

  private def forAll[A](gen: Gen[A], n: Int = 80)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // mixed ASCII + combining marks + jamo + newlines
  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    (10, Gen.alphaNumChar.map(_.toString)),
    (3, Gen.const(" ")),
    (2, Gen.oneOf("́", "̈", "̧")),  // combining marks
    (1, Gen.oneOf("é", "ä", "ç")),
    (1, Gen.oneOf("각", "너")), // jamo
    (1, Gen.oneOf("\r\n", "\r", "\n")),
    (1, Gen.oneOf("é", "각", "ü"))
  )).map(_.mkString)

  test("normalization is idempotent") {
    forAll(genText) { s =>
      val once = Normalize.nfcCanonical(s)
      assert(Normalize.nfcCanonical(once) == once)
    }
  }

  test("normalized text is NFC and newline-canonical") {
    forAll(genText) { s =>
      val n = Normalize.nfcCanonical(s)
      assert(java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFC))
      assert(!n.contains('\r'))
    }
  }

  test("offset map is monotone, within bounds, and covers spans") {
    forAll(genText) { s =>
      val (norm, m) = Normalize.nfcWithMap(s)
      var prevB = 0
      for (o <- 0 to norm.length) {
        val b = m.toRawBegin(o)
        val e = m.toRawEnd(o)
        assert(b >= 0 && b <= s.length)
        assert(e >= 0 && e <= s.length)
        assert(b >= prevB, "toRawBegin must be monotone")
        prevB = b
      }
      // a remapped span always covers at least its own width in raw
      // units minus composition shrinkage is not guaranteed, but begin
      // must never exceed end for any normalized span
      for (b <- 0 until norm.length; e <- (b + 1) to math.min(b + 4, norm.length))
        assert(m.toRawBegin(b) <= m.toRawEnd(e))
    }
  }

  test("identity segments slice identical text") {
    forAll(genText) { s =>
      val (norm, m) = Normalize.nfcWithMap(s)
      // whole-string span maps to the whole raw string
      assert(m.toRawBegin(0) == 0)
      assert(m.toRawEnd(norm.length) == s.length)
    }
  }
}
