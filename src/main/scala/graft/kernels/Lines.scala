package graft.kernels

import scala.collection.mutable
import graft.model.BBox
import Geometry.mergeBoxes

/** Synthetic text-line generation from words — re-derivation of the
  * reference's `TextLineGenerator`
  * (deepdoctection/pipe/order.py:389-524): rows by y-center membership
  * (via [[Order.groupWordsIntoLinesIdx]]), sub-lines split where the
  * horizontal gap between consecutive words exceeds `paragraphBreak`
  * (relative coords), recursive re-split of emitted sub-lines —
  * including the reference's reset-only-on-single-row accumulator
  * quirk (order.py:517-519).
  *
  * Index-based core (hot path); the id-keyed API wraps it.
  */
object Lines {

  /** A detected line: merged box + child word ids (the reference's
    * `DetectionResult` with `class_name=LINE`, order.py:415-421).
    */
  final case class LineResult(box: BBox, childIds: List[String])

  /** Index-keyed result for the hot path. */
  final case class LineIdxResult(box: BBox, childIdx: List[Int])

  /** order.py:423 `create_detection_result`, index-based core. */
  def createLinesIdx(
      boxes: IndexedSeq[BBox],
      pageWidth: Double,
      pageHeight: Double,
      makeSubLines: Boolean,
      paragraphBreak: Double,
      highestLevel: Boolean = true,
      precomputedOrder: List[(Int, Int, Int)] = null
  ): List[LineIdxResult] = {
    if (boxes.isEmpty) return Nil
    // the caller may pass the triples it already computed for word
    // ordering (identical input → identical result)
    val wordOrder =
      if (precomputedOrder != null) precomputedOrder
      else Order.groupWordsIntoLinesIdx(boxes)
    var numberRows = 0
    for ((_, line, _) <- wordOrder) if (line > numberRows) numberRows = line
    if (numberRows == 1 && !highestLevel) return Nil

    // bucket word indices by line in one pass (keeps wordOrder order)
    val rowBuckets = Array.fill(numberRows + 1)(List.newBuilder[Int])
    for ((_, line, wi) <- wordOrder) rowBuckets(line) += wi

    val out = mutable.ListBuffer.empty[LineIdxResult]
    var numberRow = 1
    while (numberRow <= numberRows) {
      // word indices of this row, sorted by ulx (order.py:466-469;
      // the stable List sort is kept for tie order, then copied to an
      // array — the loop below indexes perRow(idx) per gap comparison,
      // which on the List was an O(idx) traversal, O(n²) per row)
      val perRow: Array[Int] =
        rowBuckets(numberRow).result().sortBy(wi => boxes(wi).ulx).toArray

      def emitMerged(wis: Seq[Int]): Unit =
        out += LineIdxResult(mergeBoxes(wis.map(boxes(_))), wis.toList)

      def recurseOrMerge(wis: Seq[Int]): Boolean = {
        // re-line the sub-line: it may span multiple visual lines
        // (order.py:500-510); returns true if recursion emitted
        val sub = wis.toIndexedSeq
        val rec = createLinesIdx(sub.map(boxes(_)), pageWidth, pageHeight,
          makeSubLines, paragraphBreak, highestLevel = false)
        if (rec.nonEmpty) {
          rec.foreach(lr => out += LineIdxResult(lr.box, lr.childIdx.map(sub(_))))
          true
        } else false
      }

      if (perRow.length < 2 || !makeSubLines) {
        emitMerged(perRow)
      } else {
        // relative x-coords computed ONCE per row member (identical
        // arithmetic to BBox.toRelative: ulx/pageWidth) instead of two
        // BBox allocations per gap comparison
        val relUlx = new Array[Double](perRow.length)
        val relLrx = new Array[Double](perRow.length)
        var j = 0
        while (j < perRow.length) {
          val b = boxes(perRow(j))
          relUlx(j) = if (b.absCoords) b.ulx / pageWidth else b.ulx
          relLrx(j) = if (b.absCoords) b.lrx / pageWidth else b.lrx
          j += 1
        }
        var subLine = mutable.ListBuffer(perRow.head)
        var idx = 1
        while (idx < perRow.length) {
          if (relUlx(idx) - relLrx(idx - 1) < paragraphBreak) {
            subLine += perRow(idx)
          } else {
            // reference resets the accumulator only when the recursion
            // found a single row (order.py:517-519) — quirk preserved
            if (!recurseOrMerge(subLine.toList)) {
              emitMerged(subLine.toList)
              subLine = mutable.ListBuffer(perRow(idx))
            }
          }
          if (idx == perRow.length - 1) {
            if (!recurseOrMerge(subLine.toList)) emitMerged(subLine.toList)
          }
          idx += 1
        }
      }
      numberRow += 1
    }
    out.toList
  }

  /** Id-keyed API (fixtures/tests); delegates to the index core. */
  def createLines(
      words: Seq[(String, BBox)],
      pageWidth: Double,
      pageHeight: Double,
      makeSubLines: Boolean,
      paragraphBreak: Double,
      highestLevel: Boolean = true
  ): List[LineResult] = {
    val ids = words.map(_._1).toIndexedSeq
    createLinesIdx(words.map(_._2).toIndexedSeq, pageWidth, pageHeight,
      makeSubLines, paragraphBreak, highestLevel)
      .map(lr => LineIdxResult(lr.box, lr.childIdx))
      .map(lr => LineResult(lr.box, lr.childIdx.map(ids(_))))
  }
}
