package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{Html, Segment}
import graft.model.{LayoutLabel, Turn}
import graft.pipeline.Extract

class HtmlSpec extends AnyFunSuite {
  test("tokenizer covers text with exact offsets") {
    val s = "<p>hello <b>bold</b> world</p>"
    val texts = Html.tokenize(s).collect { case t: Html.Text => s.substring(t.begin, t.end) }
    assert(texts == List("hello ", "bold", " world"))
  }
  test("malformed markup never throws, bare < is text") {
    val s = "a < b and <unclosed and <p>fine"
    val evs = Html.tokenize(s)
    assert(evs.nonEmpty)
    val all = evs.collect { case t: Html.Text => s.substring(t.begin, t.end) }.mkString
    assert(all.contains("a < b and "))
  }
  test("script body emitted as raw and droppable") {
    val s = "<script>var x = '<p>not a tag</p>';</script><p>real</p>"
    val evs = Html.tokenize(s)
    assert(evs.exists { case t: Html.Text => t.raw; case _ => false })
    val seg = Segment.segment(s)
    assert(seg.blocks.length == 1 && seg.blocks.head.words.map(_.text).mkString(" ") == "real")
  }
  test("entity decoding") {
    assert(Html.decodeEntities("a&amp;b &lt;x&gt; &#65; &#x42;") == "a&b <x> A B")
    assert(Html.decodeEntities("no entities") == "no entities")
    assert(Html.decodeEntities("broken &amp stays") == "broken &amp stays")
  }
  test("comments and doctype skipped") {
    val s = "<!DOCTYPE html><!-- c --><p>x</p>"
    val seg = Segment.segment(s)
    assert(seg.blocks.map(_.words.map(_.text).mkString) sameElements Array("x"))
  }
}

class SegmentSpec extends AnyFunSuite {
  test("nav/footer classified as chrome, dropped by main-content") {
    val s = """<nav><a href="#">Home</a> <a href="#">Docs</a></nav><p>body text here</p><footer>contact</footer>"""
    val seg = Segment.segment(s)
    assert(seg.blocks.length == 3)
    assert(seg.blocks.map(_.kind).toList == List(LayoutLabel.NAV, LayoutLabel.TEXT, LayoutLabel.FOOTER))
    assert(seg.blocks.map(b => Segment.isMainContent(b)).toList == List(false, true, false))
  }
  test("link density drops link farms even outside chrome tags") {
    val s = """<div><a href="#">One</a> <a href="#">Two</a> <a href="#">Three</a></div><p>real content words</p>"""
    val seg = Segment.segment(s)
    assert(seg.blocks.head.linkDensity == 1.0)
    assert(!Segment.isMainContent(seg.blocks.head))
    assert(Segment.isMainContent(seg.blocks(1)))
  }
  test("table cells are cell blocks, excluded from floating text") {
    val s = "<table><tr><td>a</td><td>b</td></tr></table><p>t</p>"
    val seg = Segment.segment(s)
    assert(seg.blocks.count(_.kind == LayoutLabel.CELL) == 2)
    assert(seg.blocks.count(b => Segment.isMainContent(b)) == 1)
  }
  test("plain text paragraphs split on blank lines") {
    val seg = Segment.segment("para one words\nsame para\n\npara two")
    assert(seg.blocks.length == 2)
    assert(seg.blocks(0).words.map(_.text).mkString(" ") == "para one words same para")
    assert(seg.blocks(1).words.map(_.text).mkString(" ") == "para two")
    // single \n renders a new line within the block
    assert(seg.blocks(0).lineCount >= 2)
  }
  test("word spans always slice the source payload") {
    val payloads = Seq(
      "<p>hello &amp; goodbye</p>",
      "plain text\n\nwith paragraphs",
      """<div style="left:52%;width:48%"><p>col two</p></div>""")
    for (p <- payloads; b <- Segment.segment(p).blocks; w <- b.words) {
      assert(Html.decodeEntities(p.substring(w.begin, w.end)) == w.text)
    }
  }
  test("multi-column placement produces side-by-side geometry") {
    val s = """<div style="left:0%;width:48%"><p>left side</p></div><div style="left:52%;width:48%"><p>right side</p></div>"""
    val seg = Segment.segment(s)
    assert(seg.blocks.length == 2)
    assert(seg.blocks(0).box.lrx <= 480.0 + 1e-9)
    assert(seg.blocks(1).box.ulx >= 520.0 - 1e-9)
  }
}

class ExtractKernelSpec extends AnyFunSuite {
  private def turn(text: String, tool: String = ""): Turn =
    Turn("c1", 0, "user", text, tool, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))

  test("boilerplate page extracts main content only") {
    val t = turn("""<html><head><title>T</title></head><body><nav><a href="#">Home</a></nav><p>the real content</p><footer>x</footer></body></html>""")
    val et = Extract.extractTurn(t)
    assert(et.extractedText == "the real content")
    assert(et.metrics.blocksKept == 1 && et.metrics.blocksDropped == 2)
    assert(!et.metrics.parseFailed)
  }
  test("title + paragraph in reading order") {
    val et = Extract.extractTurn(turn("<h1>My Title</h1><p>body words</p>"))
    assert(et.extractedText == "My Title\nbody words")
    val kept = et.blocks.filter(_.kept).sortBy(_.readingOrder)
    assert(kept.map(_.kind).toList == List(LayoutLabel.TITLE, LayoutLabel.TEXT))
  }
  test("two-column div layout reads left column first") {
    val et = Extract.extractTurn(turn(
      """<div style="left:0%;width:48%"><p>left one two three four five six seven eight nine ten</p></div><div style="left:52%;width:48%;top:3%"><p>right column</p></div>"""))
    assert(et.extractedText.startsWith("left one"))
    assert(et.extractedText.endsWith("\nright column"))
  }
  test("tool payload used when text empty") {
    val et = Extract.extractTurn(turn("", """{"name":"search","result":"found it"}"""))
    assert(et.extractedText.nonEmpty)
  }
  test("deterministic ids and output across runs") {
    val t = turn("<p>alpha beta</p><p>gamma</p>")
    val a = Extract.extractTurn(t); val b = Extract.extractTurn(t)
    assert(a.extractedText == b.extractedText)
    assert(a.blocks.toList == b.blocks.toList && a.words.toList == b.words.toList)
    assert(a.blocks.map(_.id).distinct.length == a.blocks.length)
    assert(a.turn_id == graft.model.Ids.uuid3("c1#0"))
  }
  test("empty and whitespace payloads quarantine gracefully") {
    assert(Extract.extractTurn(turn("")).extractedText == "")
    assert(Extract.extractTurn(turn("   \n\n  ")).extractedText == "")
    assert(Extract.extractTurn(turn(null, null)).metrics.wordCount == 0)
  }
  test("word reading order within block matches text order") {
    val et = Extract.extractTurn(turn("<p>one two three four</p>"))
    val words = et.words.filter(_.readingOrder > 0).sortBy(_.readingOrder)
    assert(words.map(_.text).toList == List("one", "two", "three", "four"))
    assert(et.metrics.spanCount == 4)
  }
}

class JsonSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.kernels.Json

  test("values only — keys excluded, nesting and arrays handled") {
    val s = """{"name":"search","args":{"q":"cats","n":5},"tags":["a","b"],"ok":true}"""
    assert(Json.stringValues(s).map(_.text) == List("search", "cats", "5", "a", "b", "true"))
    assert(Json.toolText(s) == "search cats 5 a b true")
  }
  test("escapes decoded, spans index raw source") {
    val s = """{"msg":"line\nbreak \"quoted\" A"}"""
    val List(v) = Json.stringValues(s)
    assert(v.text == "line\nbreak \"quoted\" A")
    assert(s.substring(v.begin, v.end).startsWith("\"line"))
  }
  test("malformed input never throws") {
    assert(Json.toolText("{broken") == "")
    assert(Json.toolText("""{"a": "unterminated""").nonEmpty)
    assert(Json.toolText("not json at all") == "")
    assert(Json.toolText("") == "")
  }
  test("tool text populated alongside extracted text") {
    val t = graft.model.Turn("c", 0, "tool", "<p>visible</p>",
      """{"name":"search","args":{"q":"xyz"}}""", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    val et = graft.pipeline.Extract.extractTurn(t)
    assert(et.extractedText == "visible")
    assert(et.toolText == "search xyz")
  }
}

class ResidualSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.pipeline.{Extract, ExtractConfig}
  private def turn(text: String) =
    graft.model.Turn("c", 0, "user", text, "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))

  test("unmatched words become synthetic LINE blocks in the text flow") {
    // ioa can never exceed 1.0, so threshold 2.0 leaves every word residual
    val cfg = ExtractConfig(matchThreshold = 2.0)
    val et = Extract.extractTurn(turn("<p>alpha beta</p><p>gamma</p>"), cfg)
    val parts = et.extractedText.split("\n").filter(_.nonEmpty).toList
    assert(parts == List("alpha beta", "gamma"))
    val lineBlocks = et.blocks.filter(_.kind == graft.model.LayoutLabel.LINE)
    assert(lineBlocks.length == 2 && lineBlocks.forall(_.kept))
    assert(et.words.forall(w => w.blockId.nonEmpty && w.readingOrder > 0))
  }

  test("residuals disabled: unmatched words stay out of the text") {
    val cfg = ExtractConfig(matchThreshold = 2.0, includeResidualTextContainer = false)
    val et = Extract.extractTurn(turn("<p>alpha beta</p>"), cfg)
    assert(!et.extractedText.contains("alpha"))
    assert(et.words.exists(_.readingOrder == -1))
  }

  test("no residuals in the normal path (default config)") {
    val et = Extract.extractTurn(turn("<p>alpha beta</p>"))
    assert(!et.blocks.exists(_.kind == graft.model.LayoutLabel.LINE))
  }

  test("layoutContext: ±k reading-order window, truncated at the edges, error off the float text") {
    val payload = (1 to 5).map(i => s"<p>block number $i has words</p>").mkString
    val et = Extract.extractTurn(turn(payload))
    val ordered = et.blocks.filter(b => b.kept && b.readingOrder > 0)
      .sortBy(_.readingOrder)
    assert(ordered.length == 5)
    // interior: 2k+1 blocks centered on the target
    val mid = Extract.layoutContext(et, ordered(2).id, 1)
    assert(mid.map(_.readingOrder) == Seq(2, 3, 4))
    // edge: truncated window keeps order
    val first = Extract.layoutContext(et, ordered(0).id, 2)
    assert(first.map(_.readingOrder) == Seq(1, 2, 3))
    val last = Extract.layoutContext(et, ordered(4).id, 2)
    assert(last.map(_.readingOrder) == Seq(3, 4, 5))
    // k larger than the page → the whole ordered sequence
    assert(Extract.layoutContext(et, ordered(1).id, 99).length == 5)
    // like the reference (view.py:1397 ImageError): a non-floating id
    // is an error, not an empty window
    val e = intercept[IllegalArgumentException] {
      Extract.layoutContext(et, "not-a-block", 1)
    }
    assert(e.getMessage.contains("context"))
  }
}
