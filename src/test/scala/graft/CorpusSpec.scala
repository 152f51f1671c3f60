package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Corpus-level operators: decontamination, line dedup, quota
  * sampling. The driver oracle (q_decontaminate / q_line_dedup /
  * q_sample_quota) proves engine parity; these specs pin the kernel
  * semantics on handcrafted cases and invariants the relational oracle
  * can't state directly (first-occurrence uniqueness, rate recompute).
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("wordGrams matches the naive sliding-window derivation") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(12)
      val words = Seq.fill(n)(("a" + rnd.nextInt(5)) * (1 + rnd.nextInt(2)))
      val text = words.mkString(" ")
      val k = 1 + rnd.nextInt(6)
      val ws = text.split(" ", -1) // "" for empty text — same as SQL
      val naive =
        if (ws.length < k) Seq.empty
        else (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" "))
      assert(Corpus.wordGrams(text, k).toSeq == naive)
    }
    assert(Corpus.wordGrams(null, 3).isEmpty)
    assert(Corpus.wordGrams("a b", 3).isEmpty)
  }

  test("decontaminate counts positions and distinct grams, keeps zero-hit rows") {
    import spark.implicits._
    val bench = Seq("p q r s t u").toDF("text") // grams: "p q r s t", "q r s t u"
    val corpus = Seq(
      (1L, "x p q r s t u y"),      // both bench grams hit once each
      (2L, "p q r s t z p q r s t"), // first gram hits twice (positions 0 and 6)
      (3L, "no overlap here at all"),
      (4L, "short")                  // < 5 words — zero grams
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(corpus, "doc_id", "text",
        Corpus.benchmarkGrams(bench, "text", 5), 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 2, 2, true), (2L, 2, 1, true), (3L, 0, 0, false), (4L, 0, 0, false)))
  }

  test("lineDedup keeps the first (doc, position) occurrence of each line") {
    import spark.implicits._
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val a8 = words("a", 8); val b8 = words("b", 8); val c8 = words("c", 8)
    val corpus = Seq(
      (1L, s"$a8 $b8"),       // lines a8, b8 — both first occurrences
      (2L, s"$b8 $c8"),       // b8 dup of doc 1 → only c8 kept
      (3L, s"$a8 $a8"),       // a8 dup of doc 1 AND internal dup → empty
      (4L, words("d", 3))     // short tail line, unique
    ).toDF("doc_id", "text")
    val out = Corpus.lineDedup(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, s"$a8 $b8"),
      (2L, 2L, 1L, c8),
      (3L, 2L, 0L, ""),
      (4L, 1L, 1L, words("d", 3))))
  }

  test("lineDedup invariant: every distinct input line survives exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 40L).map { id =>
      val n = 1 + rnd.nextInt(30)
      // small vocabulary → plenty of natural dup chunks
      (id, Seq.fill(n)("w" + rnd.nextInt(4)).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val out = Corpus.lineDedup(df, "doc_id", "text").collect()
    // counting invariants: the kept-line total equals the number of
    // distinct lines in the whole corpus (each survives exactly once),
    // and n_lines sums to the total chunk count
    val allLines = docs.flatMap { case (_, text) =>
      val ws = text.split(" ", -1)
      (0 until (ws.length + 7) / 8).map(j =>
        ws.slice(j * 8, math.min(j * 8 + 8, ws.length)).mkString(" "))
    }
    assert(out.map(_.getLong(2)).sum == allLines.toSet.size)
    assert(out.map(_.getLong(1)).sum == allLines.size)
    // and with a 4-word vocabulary, dedup must actually remove lines
    assert(allLines.toSet.size < allLines.size)
  }

  test("quotaSample: exact rank quotas per stratum, recomputable rate keys") {
    import spark.implicits._
    val docs = (0L until 300L).map(id => (id, if (id % 3 == 0) "en" else "zz"))
      .toDF("doc_id", "lang")
    val out = Corpus.quotaSample(docs, "doc_id", "lang",
        Seq("en" -> 500), 50, 25)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4)))
    def lehmerKey(id: Long): Long = ((id % 2147483648L) * 48271L) % 2147483647L % 1000L
    out.foreach { case (id, lang, key, rate, _) =>
      assert(key.toLong == lehmerKey(id))
      assert(rate == (key < (if (lang == "en") 500 else 50)))
    }
    // rank verdict: exactly 25 kept per stratum (both have ≥25 rows),
    // and the kept set is the 25 smallest (key, id) pairs
    for (lang <- Seq("en", "zz")) {
      val rows = out.filter(_._2 == lang)
      val kept = rows.filter(_._5).map(r => (r._3, r._1)).sorted.toSeq
      val expected = rows.map(r => (r._3, r._1)).sorted.take(25).toSeq
      assert(kept == expected)
    }
  }

  test("dupSpanCoverage: hand-computed cross-doc and within-doc coverage") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),          // gram 'a b c'@0 shared with doc 2
      (2L, "x y a b c z"),          // 'a b c'@2 -> tokens 2..4 covered
      (3L, "q r"),                  // < k words: zero grams, zero coverage
      (4L, "m n o m n o m n o")     // every 3-gram repeats within the doc
    ).toDF("doc_id", "t")
    val out = Corpus.dupSpanCoverage(docs, "doc_id", "t", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out(0) == ((1L, 6, 3L, 5000L, true)))   // tokens 0..2
    assert(out(1) == ((2L, 6, 3L, 5000L, true)))   // tokens 2..4
    assert(out(2) == ((3L, 2, 0L, 0L, false)))
    assert(out(3) == ((4L, 9, 9L, 10000L, true)))  // fully covered
    // no duplication anywhere -> all zeros
    val clean = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "t")
    val cout = Corpus.dupSpanCoverage(clean, "doc_id", "t", 3).collect()
    assert(cout.forall(r => r.getLong(2) == 0L && !r.getBoolean(4)))
  }

  test("commonWordStats: exact top-k with deterministic tie-break") {
    import spark.implicits._
    // counts: a=4, b=3, c=3, d=1 — top-2 must be {a, b} (c ties b on
    // count; 'b' < 'c' wins the (count DESC, word ASC) order)
    val docs = Seq(
      (0L, "a a b c"),
      (1L, "a b c d"),
      (2L, "a b c")).toDF("doc_id", "t")
    val out = Corpus.commonWordStats(docs, "doc_id", "t", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out(0) == ((0L, 4, 3L, 7500L, false)))  // a a b
    assert(out(1) == ((1L, 4, 2L, 5000L, false)))  // a b
    assert(out(2) == ((2L, 3, 2L, 6666L, false)))  // a b
    // topN >= vocab: everything common, verdict passes
    val all = Corpus.commonWordStats(docs, "doc_id", "t", 10).collect()
    assert(all.forall(r => r.getLong(2) == r.getInt(1).toLong && r.getBoolean(4)))
  }

  test("surprisalBuckets: hand-computed bit-surprisal and tertile assignment") {
    import spark.implicits._
    // model: a=3, b=1 → M = 5, bitlen(M) = 3
    // bits: a → 3-bitlen(4)=0, b → 3-bitlen(2)=1, OOV → 3-bitlen(1)=2
    val ref = Seq((99L, "a a a b")).toDF("doc_id", "t")
    val docs = Seq(
      (0L, "a a a a"),  // 0 bits, mean 0
      (1L, "a b a b"),  // 2 bits / 4 → mean 500
      (2L, "z z"),      // 4 bits / 2 → mean 2000
      (3L, "b b b"),    // 3 bits / 3 → mean 1000
      (4L, "a z")       // 2 bits / 2 → mean 1000 (ties doc 3; doc_id breaks)
    ).toDF("doc_id", "t")
    val out = Corpus.surprisalBuckets(docs, "doc_id", "t", ref, "t", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // n=5, nBuckets=2 → sizes 3,2; order d0,d1,d3,d4,d2
    assert(out.toSeq == Seq(
      (0L, 4L, 0L, 0L, 1),
      (1L, 4L, 2L, 500L, 1),
      (2L, 2L, 4L, 2000L, 2),
      (3L, 3L, 3L, 1000L, 1),
      (4L, 2L, 2L, 1000L, 2)))
  }

  test("surprisalBuckets: distributed ntile matches the naive rank derivation") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (0L until 61L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(12))("w" + rnd.nextInt(9)).mkString(" "))
    }
    val df = docs.toDF("doc_id", "t")
    val ref = df.filter(col("doc_id") % 4 === 0)
    for (nb <- Seq(1, 3, 7, 61, 100)) {
      val out = Corpus.surprisalBuckets(df, "doc_id", "t", ref, "t", nb)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getInt(4))).toSeq
      // naive ntile: sort by (mean, id), first (n % nb) buckets get an
      // extra row on top of n / nb
      val ordered = out.sortBy(t => (t._2, t._1))
      val n = ordered.size; val size = n / nb; val rem = n % nb
      val naive = ordered.zipWithIndex.map { case ((id, _, _), i) =>
        val rank = i + 1
        val b = if (rank <= rem * (size + 1)) (rank - 1) / (size + 1) + 1
                else rem + (rank - rem * (size + 1) - 1) / math.max(size, 1) + 1
        id -> b
      }.toMap
      // the closed form above is itself pinned by the hand case and the
      // DuckDB built-in ntile oracle; here it must agree per document
      assert(out.forall { case (id, _, b) => b == naive(id) })
      assert(out.map(_._3).distinct.sorted == (1 to math.min(nb, n)).toSeq)
    }
  }

  test("dsirWeights matches a naive independent derivation and ranks target-like docs higher") {
    import spark.implicits._
    def md5bucket(g: String, nb: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = d.take(2).map(b => f"$b%02x").mkString // first 4 hex chars
      java.lang.Long.parseLong(hex, 16) % nb
    }
    def bigrams(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 2) Seq.empty
      else (0 until ws.length - 1).map(i => ws(i) + " " + ws(i + 1))
    }
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val rnd = new scala.util.Random(31)
    val corpus = (0L until 50L).map { id =>
      val vocab = if (id % 5 == 0) "t" else "u" // t-docs resemble the target
      (id, Seq.fill(rnd.nextInt(10))(vocab + rnd.nextInt(4)).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "t")
    val target = df.filter(col("doc_id") % 5 === 0)
    val nb = 64 // small bucket count → real collisions exercised
    val out = Corpus.dsirWeights(df, "doc_id", "t", target, "t", nb, 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq.sortBy(_._1)
    // naive twin: rebuild both hashed models and every per-doc sum
    val rawB = corpus.flatMap(d => bigrams(d._2)).map(md5bucket(_, nb))
    val tgtB = corpus.filter(_._1 % 5 == 0).flatMap(d => bigrams(d._2))
      .map(md5bucket(_, nb))
    val rc = rawB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tc = tgtB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val const = bitlen(rawB.size + 1L) - bitlen(tgtB.size + 1L)
    val naive = corpus.map { case (id, t) =>
      val bs = bigrams(t).map(md5bucket(_, nb))
      val tb = bs.map(b => bitlen(tc.getOrElse(b, 0L) + 1)).sum
      val rb = bs.map(b => bitlen(rc(b) + 1)).sum
      val w = tb - rb + bs.size * const
      (id, bs.size.toLong, tb, rb, w, w >= 0L)
    }
    assert(out == naive)
    // semantic direction: target-like docs must outrank alien docs of
    // comparable length (their grams carry real target counts)
    val byId = out.map(t => t._1 -> t).toMap
    val tMax = out.filter(t => t._1 % 5 == 0 && t._2 > 0).map(_._5).max
    val uMax = out.filter(t => t._1 % 5 != 0 && t._2 > 0).map(_._5).max
    assert(tMax > uMax)
    // zero-gram docs come back with zeros, not dropped
    assert(out.size == corpus.size)
    out.filter(_._2 == 0L).foreach { t =>
      assert((t._3, t._4, t._5) == ((0L, 0L, 0L)))
    }
    assert(byId.nonEmpty)

    // regression: the target need NOT be a subset of the corpus (the
    // published use is an external curated domain). Target grams in
    // buckets with zero raw grams must still count toward the target
    // total mass Mt — a raw-left-joined mass would silently drop them
    // and flip keep verdicts.
    val corpus2 = Seq((0L, "a b")).toDF("doc_id", "t")
    val target2 = Seq((9L, "c d e")).toDF("doc_id", "t") // 2 grams, disjoint
    val o2 = Corpus.dsirWeights(corpus2, "doc_id", "t", target2, "t", 4096, 0L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val b2 = md5bucket("a b", 4096)
    val tc2 = Seq("c d", "d e").map(md5bucket(_, 4096)).count(_ == b2).toLong
    val tb2 = bitlen(tc2 + 1); val rb2 = bitlen(1L + 1)
    val w2 = tb2 - rb2 + 1L * (bitlen(1L + 1) - bitlen(2L + 1)) // Mr=1+1, Mt=2+1
    assert(o2.toSeq == Seq((1L, tb2, rb2, w2, w2 >= 0L)))
  }

  test("withRunningTotal: distributed prefix sum equals the naive cumulative sum") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // k alone has heavy duplicates; (k, doc_id) is the required TOTAL
    // order (the operator's documented precondition) — values under
    // tied k still accumulate deterministically through the tie-break
    val rows = (0L until 200L).map(id => (id, rnd.nextInt(8).toLong, 1L + rnd.nextInt(50)))
    val df = rows.toDF("doc_id", "k", "v")
    for (np <- Seq(None, Some(1), Some(7), Some(64))) {
      val out = graft.operators.Positional
        .withRunningTotal(df, Seq(col("k"), col("doc_id")), "v", "cum", np)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      var s = 0L
      rows.sortBy(t => (t._2, t._1)).foreach { case (id, _, v) =>
        s += v
        assert(out(id) == s, s"doc $id at np=$np")
      }
    }
  }

  test("budgetPrefix: exact prefix under (priority DESC, id ASC), budget boundary inclusive") {
    import spark.implicits._
    val docs = Seq(
      (0L, 10L, "a b c"),     // 3 tokens, priority 10 → first
      (1L, 10L, "d e"),       // 2 tokens, ties priority, id orders second
      (2L, 7L, "f g h i"),    // 4 tokens
      (3L, 1L, "j")           // 1 token, last
    ).toDF("doc_id", "prio", "t")
    // order 0,1,2,3 → cums 3,5,9,10
    val out = Corpus.budgetPrefix(docs, "doc_id", "prio", "t", 9L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (0L, 10L, 3L, 3L, true),
      (1L, 10L, 2L, 5L, true),
      (2L, 7L, 4L, 9L, true),   // inclusive boundary
      (3L, 1L, 1L, 10L, false)))
    // budget below the first doc → nothing kept; huge budget → all kept
    assert(Corpus.budgetPrefix(docs, "doc_id", "prio", "t", 2L)
      .collect().forall(!_.getBoolean(4)))
    assert(Corpus.budgetPrefix(docs, "doc_id", "prio", "t", 1000L)
      .collect().forall(_.getBoolean(4)))
  }

  test("budgetPrefix: precomputedTokensCol equals the tokenCounter path") {
    import spark.implicits._
    val bpe = Some(graft.functions.Bpe.countTokens _)
    val docs = Seq(
      (0L, 2L, "the and"), (1L, 2L, "nation"), (2L, 1L, "thing king"))
      .toDF("doc_id", "prio", "t")
    val viaCounter = Corpus.budgetPrefix(docs, "doc_id", "prio", "t", 7L,
      tokenCounter = bpe).orderBy("doc_id").collect().toSeq
    val withCol = docs.withColumn("n",
      graft.operators.TextStats.tokenCountCol(bpe, col("t")))
    val viaPrecomputed = Corpus.budgetPrefix(withCol, "doc_id", "prio", "t", 7L,
      precomputedTokensCol = Some("n")).orderBy("doc_id").collect().toSeq
    assert(viaCounter == viaPrecomputed)
    // merged counts: "the and"=3, "nation"=4, "thing king"=5 → cums
    // 3,7,12 under (prio DESC, id ASC) → kept, kept(boundary), dropped
    assert(viaCounter.map(r => (r.getLong(0), r.getBoolean(4))) ==
      Seq((0L, true), (1L, true), (2L, false)))
  }

  test("mixtureInterleave: exact stride order and prefix proportionality") {
    import spark.implicits._
    val a = (1L to 6L).toDF("doc_id")
    val b = (101L to 103L).toDF("doc_id")
    val got = Corpus.mixtureInterleave(Seq(("A", a, 2.0), ("B", b, 1.0)), "doc_id")
      .orderBy("pos")
      .select("pos", "source", "id", "k")
      .as[(Long, String, Long, Long)].collect()
    // keys: A .5,1,1.5,2,2.5,3 / B 1,2,3; ties (1.0, 2.0, 3.0) break
    // A before B → perfect A A B repetition
    assert(got.map(_._2).toSeq ==
      Seq("A", "A", "B", "A", "A", "B", "A", "A", "B"))
    assert(got.map(_._1).toSeq == (1L to 9L))
    assert(got.map(_._3).toSeq ==
      Seq(1L, 2L, 101L, 3L, 4L, 102L, 5L, 6L, 103L))
    // stride guarantee: every prefix stays within one stride of the
    // 2:1 weight proportion
    for (m <- 1 to 9) {
      val prefix = got.take(m)
      val nA = prefix.count(_._2 == "A").toDouble
      val nB = prefix.count(_._2 == "B").toDouble
      assert(math.abs(nA - 2 * nB) <= 2, s"prefix $m: $nA vs $nB")
    }
    // local-twin parity on random sources/weights: the distributed
    // double zipWithIndex must reproduce the locally computed
    // (k/w, source, id) total order exactly
    val rnd = new scala.util.Random(31)
    val srcs = (0 until 4).map { s =>
      val ids = (0 until 10 + rnd.nextInt(40))
        .map(_ => rnd.nextLong().abs % 10000).distinct.map(i => i + s * 100000L)
      (s"s$s", ids, Array(0.5, 1.0, 2.0, 3.0)(rnd.nextInt(4)))
    }
    val gotRnd = Corpus.mixtureInterleave(
      srcs.map { case (n, ids, w) => (n, ids.toDF("doc_id").repartition(3), w) },
      "doc_id")
      .orderBy("pos").select("source", "id")
      .as[(String, Long)].collect().toSeq
    val local = srcs.flatMap { case (n, ids, w) =>
      ids.sorted.zipWithIndex.map { case (id, i) => ((i + 1) / w, n, id) }
    }.sortBy(identity).map(t => (t._2, t._3))
    assert(gotRnd == local)

    // guards: duplicate source names and null ids would silently break
    // the (source, id) total order — both fail loud instead
    intercept[IllegalArgumentException] {
      Corpus.mixtureInterleave(Seq(("A", a, 1.0), ("A", b, 1.0)), "doc_id")
    }
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    intercept[Exception] {
      Corpus.mixtureInterleave(Seq(("N", withNull, 1.0)), "doc_id").collect()
    }
  }

  test("plan shape: the corpus-selection family never funnels through one partition") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(id => (id, s"w${id % 7} w${id % 5} w${id % 3}")).toDF("doc_id", "t")
    // surprisalBuckets: model join broadcast; the rank window is keyed
    // by mean_millibits (parallel), never an empty partition spec
    val ppl = Corpus.surprisalBuckets(docs, "doc_id", "t",
      docs.filter(col("doc_id") % 3 === 0), "t", 3)
      .queryExecution.executedPlan.toString
    assert(!ppl.contains("SinglePartition"), ppl)
    assert(ppl.contains("BroadcastHashJoin"), ppl)
    // dsirWeights: per-bucket model broadcast onto corpus grams
    val dsir = Corpus.dsirWeights(docs, "doc_id", "t",
      docs.filter(col("doc_id") % 3 === 0), "t", 64, 0L)
      .queryExecution.executedPlan.toString
    assert(!dsir.contains("SinglePartition"), dsir)
    assert(dsir.contains("BroadcastHashJoin"), dsir)
    // canonicalSurvivors: the argmax is map-side-combinable groupBy
    // aggregations keyed by the cluster label + join-backs — NO window
    // partitioned by label (a giant near-dup cluster would serialize
    // into one sort task) and no global funnel
    val surv = graft.operators.Dedup.canonicalSurvivors(
      docs.select(col("doc_id").as("id"), col("doc_id").as("weight")),
      Seq((0L, 1L)).toDF("id_a", "id_b"))
      .queryExecution.executedPlan.toString
    assert(!surv.contains("SinglePartition"), surv)
    assert(surv.contains("hashpartitioning(label"), surv)
    assert(!surv.contains("Window"), surv)
    assert(surv.contains("partial_max") || surv.contains("partial_min"), surv)
    // budgetPrefix's shuffle lives in the RDD lineage by documented
    // design (withRunningTotal) — its parallelism is pinned by the
    // multi-partition parity test above, not by plan inspection
  }
}
