package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Turn
import graft.pipeline.{Extract, ExtractConfig}

/** USE_LAYOUT_LINK service (analyzer/factory.py:1784 →
  * MatchingService + NeighbourMatcher, pipe/common.py:182): captions
  * link to their nearest configured parent block by center distance;
  * the service is config-gated and off by default.
  */
class LayoutLinkSpec extends AnyFunSuite {

  private val payload =
    """<p>alpha para</p><figcaption>cap text</figcaption>""" +
      """<div style="left:0%;width:40%;top:50%"><p>far away body</p></div>"""
  private def turn = Turn("c", 0, "user", payload, "", new java.sql.Timestamp(0L))

  test("caption links to the nearest parent block by center distance") {
    val cfg = ExtractConfig(
      layoutLinkParents = Set("text"), layoutLinkChildren = Set("caption"))
    val et = Extract.extractTurn(turn, cfg)
    val byKind = et.blocks.groupBy(_.kind)
    val Array(cap) = byKind("caption")
    val alpha = byKind("text").minBy(_.box.uly) // the adjacent paragraph
    assert(cap.linkedBlockId == alpha.id,
      s"caption must link to the adjacent paragraph, got ${cap.linkedBlockId}")
    // parents and unrelated blocks carry no link
    assert(byKind("text").forall(_.linkedBlockId == ""))
  }

  test("canonical caption→figure pairing (NeighbourMatcher example) is expressible") {
    // the reference's canonical layout-link config pairs captions with
    // figures (parent_categories=["figure"]); that requires figure
    // blocks to carry their own label, not fold into 'text'
    val figPayload =
      """<figure>chart body here</figure><figcaption>fig cap</figcaption>""" +
        """<div style="left:0%;width:40%;top:50%"><p>far away body</p></div>"""
    val cfg = ExtractConfig(
      layoutLinkParents = Set("figure"), layoutLinkChildren = Set("caption"))
    val et = Extract.extractTurn(
      Turn("c", 0, "user", figPayload, "", new java.sql.Timestamp(0L)), cfg)
    val fig = et.blocks.find(_.kind == "figure")
    assert(fig.nonEmpty, "figure block must carry the FIGURE label")
    val cap = et.blocks.find(_.kind == "caption").get
    assert(cap.linkedBlockId == fig.get.id,
      s"caption must link to the figure, got ${cap.linkedBlockId}")
    // the plain paragraph is untouched
    assert(et.blocks.filter(_.kind == "text").forall(_.linkedBlockId == ""))
  }

  test("the service is off by default (config gate, like USE_LAYOUT_LINK)") {
    val et = Extract.extractTurn(turn)
    assert(et.blocks.forall(_.linkedBlockId == ""))
  }

  test("token classifier slot: classes ride Word.tokenClass when plugged") {
    val cfg = ExtractConfig(
      tokenClassifier = Some(graft.operators.Lm.heuristicTokenClass))
    val et = Extract.extractTurn(Turn("c", 0, "user",
      "<p>total 1234 a5b x</p>", "", new java.sql.Timestamp(0L)), cfg)
    val byText = et.words.map(w => w.text -> w.tokenClass).toMap
    assert(byText == Map("total" -> "word", "1234" -> "number",
      "a5b" -> "alnum", "x" -> "single"))
    // default config keeps the reference's OTHER default
    val plain = Extract.extractTurn(Turn("c", 0, "user",
      "<p>total 1234</p>", "", new java.sql.Timestamp(0L)))
    assert(plain.words.forall(_.tokenClass == "other"))
  }

  test("sequence classifier slot: docClass rides the turn when plugged") {
    val cfg = ExtractConfig(
      sequenceClassifier = Some(graft.operators.Lm.heuristicSeqClass))
    def run(payload: String, c: ExtractConfig = cfg) =
      Extract.extractTurn(Turn("c", 0, "user", payload, "", new java.sql.Timestamp(0L)), c)
    assert(run("<p>total 1234</p>").docClass == "report")
    assert(run("<p>short prose</p>").docClass == "note")
    assert(run("<p>" + "wordy text " * 20 + "</p>").docClass == "longform")
    // default config keeps the reference's service-off default
    assert(run("<p>total 1234</p>", ExtractConfig()).docClass == "")
  }

  test("line matcher parents LINE annotations onto list blocks (USE_LINE_MATCHER)") {
    val lm = "<ul><li>item one</li><li>item two</li></ul><p>plain para here</p>"
    val cfg = ExtractConfig(useLineMatcher = true)
    val et = Extract.extractTurn(Turn("c", 0, "user", lm, "", new java.sql.Timestamp(0L)), cfg)
    val liIds = et.blocks.filter(_.kind == "list_item").map(_.id).toSet
    assert(liIds.size == 2)
    // each list item's line is parented onto ITS list block; the
    // paragraph's line clears no list parent
    val matched = et.lines.filter(_.listId.nonEmpty)
    assert(matched.length == 2, s"expected 2 matched lines, got ${et.lines.toList}")
    assert(matched.forall(l => l.listId == l.blockId && liIds.contains(l.listId)))
    assert(et.lines.count(_.listId.isEmpty) == 1)
    // config gate: off by default like the reference yaml
    val off = Extract.extractTurn(Turn("c", 0, "user", lm, "", new java.sql.Timestamp(0L)))
    assert(off.lines.forall(_.listId == ""))
  }

  test("removeAnnotations clears links that would dangle") {
    val cfg = ExtractConfig(
      layoutLinkParents = Set("text"), layoutLinkChildren = Set("caption"))
    val et = Extract.extractTurn(turn, cfg)
    val cap = et.blocks.find(_.kind == "caption").get
    val removed = Extract.removeAnnotations(et, Set(cap.linkedBlockId))
    val capAfter = removed.blocks.find(_.kind == "caption").get
    assert(capAfter.linkedBlockId == "")
  }
}
