package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Bpe

/** External anchoring of the BPE merge loop: the committed
  * `token_counts.json` was produced by an INDEPENDENT Python
  * implementation of the standard algorithm
  * (tools/make_bpe_fixtures.py — zero shared code with Bpe.scala);
  * the Scala encoder must reproduce every token SEQUENCE exactly, for
  * both the bare and the space-prefixed form of each fixture word.
  */
class BpeSpec extends AnyFunSuite {

  private val fixtures: Map[String, (Vector[String], Vector[String])] = {
    val in = getClass.getResourceAsStream("/bpe/token_counts.json")
    require(in != null, "missing committed fixture /bpe/token_counts.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(in)
    in.close()
    import scala.jdk.CollectionConverters._
    root.properties().asScala.map { e =>
      def arr(k: String): Vector[String] =
        e.getValue.get(k).elements().asScala.map(_.asText()).toVector
      e.getKey -> (arr("bare_tokens"), arr("spaced_tokens"))
    }.toMap
  }

  test("the committed fixture covers the full pinned vocabulary") {
    assert(fixtures.size == 16)
  }

  test("Scala merge loop reproduces every Python-derived token sequence") {
    for ((w, (bare, spaced)) <- fixtures) {
      assert(Bpe.encode(w) == bare, s"bare '$w'")
      assert(Bpe.encode(" " + w) == spaced, s"spaced ' $w'")
    }
  }

  test("counts match the committed fixture counts") {
    val in = getClass.getResourceAsStream("/bpe/token_counts.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(in)
    in.close()
    import scala.jdk.CollectionConverters._
    for (e <- root.properties().asScala) {
      assert(Bpe.encode(e.getKey).length == e.getValue.get("bare_count").asInt())
      assert(Bpe.encode(" " + e.getKey).length == e.getValue.get("spaced_count").asInt())
    }
  }

  test("text-level counting sums pre-token encodes") {
    // pre-tokens: "the", " and", " thing" -> 1 + 2 + 3
    assert(Bpe.countTokens("the and thing") == 6)
    assert(Bpe.countTokens("") == 0)
    assert(Bpe.countTokens(null) == 0)
  }

  test("merges fire deepest-first by rank, not input order") {
    // "nation": 'on' (rank 6) beats 'at' (8) and 'ti' (9); the final
    // split is n|at|i|on — NOT n|a|tion (ti->tion never gets to fire
    // because 'on' merges first). The fixture pins this via Python;
    // spell it out here so the rank-priority contract is readable.
    assert(Bpe.encode("nation") == Vector("n", "at", "i", "on"))
    assert(Bpe.encode("motion") == Vector("m", "o", "tion"))
  }

  test("unknown characters and digits pass through as singletons") {
    assert(Bpe.encode("x7!") == Vector("x", "7", "!"))
    // pre-tokenizer splits digits/punct into their own pre-tokens
    assert(Bpe.countTokens("the 42!") == 1 + 3 + 1)
  }

  test("all merged occurrences of the best pair collapse in one pass") {
    // "thth": pair (t,h) occurs twice; one iteration merges both
    assert(Bpe.encode("thth") == Vector("th", "th"))
  }
}
