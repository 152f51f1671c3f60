package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{Pdf, Order, Match}
import graft.model.BBox

/** Real parsed PDF words flowing through the geometric pipeline —
  * the reference's core chain (PdfPlumberTextDetector words →
  * MatchingService → TextOrderService). The q_pdf_reading_order
  * driver oracle pins the same expectations at sf scale; this suite
  * is the single-doc twin plus the Match leg.
  */
class PdfGeomSpec extends AnyFunSuite {

  private def wordsOf(id: Long) =
    Pdf.splitPagesWords(SparkEntry.synthPdfTwoColumn(id))

  test("two-column PDF words order left column fully before right") {
    val ws = wordsOf(7L)
    assert(ws.map(_.text) == Seq("alpha", "delta", "beta7", "eps7", "gamma", "zeta"),
      "parse order interleaves rows top-down")
    val anns = ws.map(w => w.wordNo.toString -> BBox(w.x0, w.top, w.x1, w.bottom, absCoords = true))
    val byId = ws.map(w => w.wordNo.toString -> w.text).toMap
    val ordered = Order.orderBlocks(anns, 612.0, 792.0).map { case (ord, wid) => (ord, byId(wid)) }
    assert(ordered == Seq(
      (1, "alpha"), (2, "beta7"), (3, "gamma"),
      (4, "delta"), (5, "eps7"), (6, "zeta")))
  }

  test("line grouping spans both columns: three rows, reference-inverted numbering") {
    val ws = wordsOf(3L)
    val anns = ws.map(w => w.wordNo.toString -> BBox(w.x0, w.top, w.x1, w.bottom, absCoords = true))
    val byId = ws.map(w => w.wordNo.toString -> w.text).toMap
    val lines = Order.groupWordsIntoLines(anns).map { case (_, line, wid) => byId(wid) -> line }.toMap
    assert(lines == Map(
      "alpha" -> 3, "delta" -> 3, "beta3" -> 2, "eps3" -> 2, "gamma" -> 1, "zeta" -> 1))
  }

  test("readPdfWords source: file scan to positioned word rows, no shuffle") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf_words_src")
    try {
      java.nio.file.Files.write(dir.resolve("doc_a.pdf"), SparkEntry.synthPdfTwoColumn(7L))
      val df = graft.sources.Serializers.readPdfWords(spark, dir.toString)
      val rows = df.select("word_no", "text", "x0", "top")
        .as[(Int, String, Double, Double)].collect().sortBy(_._1)
      assert(rows.map(_._2).toSeq ==
        Seq("alpha", "delta", "beta7", "eps7", "gamma", "zeta"))
      assert(rows(0)._3 == 50.0 && rows(1)._3 == 320.0)
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
        "word extraction must stay inside the scan stage")
    } finally {
      val st = java.nio.file.Files.walk(dir)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally st.close()
    }
  }

  test("PDF words match to layout blocks by intersection (ioa)") {
    val ws = wordsOf(1L)
    val blocks = IndexedSeq(
      BBox(40.0, 60.0, 200.0, 140.0, absCoords = true), // left column region
      BBox(310.0, 60.0, 500.0, 140.0, absCoords = true)) // right column region
    val children = ws.map(w => BBox(w.x0, w.top, w.x1, w.bottom, absCoords = true)).toIndexedSeq
    val pairs = Match.matchByIntersection(blocks, children, rule = "ioa",
      threshold = 0.3, maxParentOnly = true)
    val byParent = pairs.groupBy(_._2).view.mapValues(_.map(p => ws(p._1).text).toSet).toMap
    assert(byParent(0) == Set("alpha", "beta1", "gamma"))
    assert(byParent(1) == Set("delta", "eps1", "zeta"))
  }
}
