package graft.kernels

import scala.collection.mutable
import graft.model.BBox
import Geometry.mergeBoxes

/** Synthetic text-line generation from words — re-derivation of the
  * reference's `TextLineGenerator`
  * (deepdoctection/pipe/order.py:389-524): rows by y-center membership
  * (via [[Order.groupWordsIntoLines]]), sub-lines split where the
  * horizontal gap between consecutive words exceeds `paragraphBreak`
  * (relative coords), recursive re-split of emitted sub-lines.
  */
object Lines {

  /** A detected line: merged box + child word ids (the reference's
    * `DetectionResult` with `class_name=LINE` and child relationships,
    * order.py:415-421).
    */
  final case class LineResult(box: BBox, childIds: List[String])

  /** order.py:423 `create_detection_result`.
    *
    * @param words (id, box) word annotations; boxes absolute or relative
    * @param pageWidth for absolute→relative gap computation
    * @param makeSubLines split lines at paragraph breaks
    * @param paragraphBreak relative-x gap threshold (conf default 0.035)
    */
  def createLines(
      words: Seq[(String, BBox)],
      pageWidth: Double,
      pageHeight: Double,
      makeSubLines: Boolean,
      paragraphBreak: Double,
      highestLevel: Boolean = true
  ): List[LineResult] = {
    if (words.isEmpty) return Nil
    val byId = words.toMap
    val wordOrder = Order.groupWordsIntoLines(words)
    val numberRows = wordOrder.map(_._2).max
    if (numberRows == 1 && !highestLevel) return Nil

    val out = mutable.ListBuffer.empty[LineResult]
    for (numberRow <- 1 to numberRows) {
      val perRow = wordOrder.filter(_._2 == numberRow).map(_._3)
      val annsPerRow = perRow.map(id => (id, byId(id))).sortBy(_._2.ulx)

      if (annsPerRow.length < 2 || !makeSubLines) {
        out += LineResult(mergeBoxes(annsPerRow.map(_._2)), annsPerRow.map(_._1).toList)
      } else {
        var subLine = mutable.ListBuffer(annsPerRow.head)
        for (idx <- 1 until annsPerRow.length) {
          val (_, prevRaw) = annsPerRow(idx - 1)
          val (_, curRaw) = annsPerRow(idx)
          val prev = prevRaw.toRelative(pageWidth, pageHeight)
          val cur = curRaw.toRelative(pageWidth, pageHeight)
          if (cur.ulx - prev.lrx < paragraphBreak) {
            subLine += annsPerRow(idx)
          } else {
            // split: recursively re-line the accumulated sub-line —
            // it may itself span multiple visual lines (order.py:500-510).
            // NB the reference resets the accumulator only when the
            // recursion found a single row (order.py:517-519) — ported
            // literally, quirk included.
            val rec = createLines(subLine.toList, pageWidth, pageHeight, makeSubLines,
              paragraphBreak, highestLevel = false)
            if (rec.nonEmpty) out ++= rec
            else {
              out += LineResult(mergeBoxes(subLine.map(_._2)), subLine.map(_._1).toList)
              subLine = mutable.ListBuffer(annsPerRow(idx))
            }
          }
          if (idx == annsPerRow.length - 1) {
            val rec = createLines(subLine.toList, pageWidth, pageHeight, makeSubLines,
              paragraphBreak, highestLevel = false)
            if (rec.nonEmpty) out ++= rec
            else out += LineResult(mergeBoxes(subLine.map(_._2)), subLine.map(_._1).toList)
          }
        }
      }
    }
    out.toList
  }
}
