package graft.kernels

import scala.collection.mutable
import graft.model.BBox
import Geometry._

/** Geometric table segmentation — the detector-box path of the
  * reference's table subsystem, for callers that bring row/column/cell
  * boxes instead of markup:
  *
  *  - `chooseItemsByIou`  — dedupe overlapping row/col candidates
  *    (segment.py:91 `choose_items_by_iou`)
  *  - `stretchItems`      — stretch rows/cols to the table edges
  *    (segment.py:150/:443 `stretch_item_per_table`/`stretch_items`)
  *  - `tileItems`         — make items fully tile the table, stretch
  *    rule `left` or `equal` (segment.py:399)
  *  - `segmentCells`      — assign row/col numbers + spans to cells by
  *    weighted-IoA matching; row_num = min matched item number, span =
  *    match count (segment.py:492-584 `segment_table`)
  *  - `intersectionCells` — Pubtables variant: cells as row×col
  *    intersections (segment.py:587 `create_intersection_cells`,
  *    box.py:814 `intersection_boxes`)
  *  - `refineRectangles`  — merge multiply-assigned cells into
  *    rectangular tilings via connected components
  *    (refine.py:51-348, `_tiling_to_cell_position` :225)
  *
  * All pure Scala over per-row arrays — row-local, no shuffle.
  */
object TableGeom {

  final case class Item(id: String, box: BBox, score: Double)
  final case class CellSeg(id: String, rowNum: Int, colNum: Int, rowSpan: Int, colSpan: Int)

  /** segment.py:91: keep the higher-score item of any pair with
    * IoU above `iouThreshold` (greedy by descending score, stable).
    */
  def chooseItemsByIou(items: Seq[Item], iouThreshold: Double): Seq[Item] = {
    val sorted = items.sortBy(i => -i.score)
    val kept = mutable.ListBuffer.empty[Item]
    for (it <- sorted)
      if (!kept.exists(k => iou(k.box, it.box) > iouThreshold)) kept += it
    // restore input order
    val keptIds = kept.map(_.id).toSet
    items.filter(i => keptIds.contains(i.id))
  }

  /** segment.py:150/:443: rows get the table's x-extent, columns the
    * table's y-extent.
    */
  def stretchItems(table: BBox, rows: Seq[Item], cols: Seq[Item]): (Seq[Item], Seq[Item]) = {
    val sRows = rows.map(r => r.copy(box = BBox(table.ulx, r.box.uly, table.lrx, r.box.lry, r.box.absCoords)))
    val sCols = cols.map(c => c.copy(box = BBox(c.box.ulx, table.uly, c.box.lrx, table.lry, c.box.absCoords)))
    (sRows, sCols)
  }

  /** segment.py:399 `tile_tables_with_items_per_table`: adjust row
    * uppers so rows tile the table vertically. Rule `equal`: boundary
    * at the midpoint of the gap; rule `left`: boundary at the previous
    * row's lower edge. First row starts at the table top, last row
    * ends at the table bottom. (Same logic applies to columns on x.)
    */
  def tileItems(table: BBox, rows: Seq[Item], rule: String = "left",
      vertical: Boolean = true): Seq[Item] = {
    if (rows.isEmpty) return rows
    val sorted = rows.sortBy(r => if (vertical) r.box.cy else r.box.cx)
    val out = mutable.ArrayBuffer.empty[Item]
    for ((r, i) <- sorted.zipWithIndex) {
      val (lo, hi) =
        if (vertical) {
          val top =
            if (i == 0) table.uly
            else if (rule == "equal") (sorted(i - 1).box.lry + r.box.uly) / 2.0
            else out(i - 1).box.lry
          val bottom = if (i == sorted.length - 1) table.lry else r.box.lry
          (top, bottom)
        } else {
          val left =
            if (i == 0) table.ulx
            else if (rule == "equal") (sorted(i - 1).box.lrx + r.box.ulx) / 2.0
            else out(i - 1).box.lrx
          val right = if (i == sorted.length - 1) table.lrx else r.box.lrx
          (left, right)
        }
      out += (if (vertical) r.copy(box = BBox(r.box.ulx, lo, r.box.lrx, hi, r.box.absCoords))
              else r.copy(box = BBox(lo, r.box.uly, hi, r.box.lry, r.box.absCoords)))
    }
    out.toSeq
  }

  /** segment.py:492-584: number rows by cy and columns by cx (1-based,
    * segment.py:944-955), then match cells against items with
    * weighted IoA; per cell: row_num = min matched row number,
    * row_span = number of matched rows (0 when nothing matches —
    * `_default_segment_table`).
    */
  def segmentCells(rows: Seq[Item], cols: Seq[Item], cells: Seq[Item],
      rule: String = "ioa", thresholdRows: Double = 0.4,
      thresholdCols: Double = 0.4): Seq[CellSeg] = {
    val rowsSorted = rows.sortBy(_.box.cy).toIndexedSeq
    val colsSorted = cols.sortBy(_.box.cx).toIndexedSeq
    val cellBoxes = cells.map(_.box).toIndexedSeq

    val rowMatches = Match.matchByIntersection(
      rowsSorted.map(_.box), cellBoxes, rule, thresholdRows,
      useWeightedIntersections = true)
    val colMatches = Match.matchByIntersection(
      colsSorted.map(_.box), cellBoxes, rule, thresholdCols,
      useWeightedIntersections = true)

    val rowByCell = rowMatches.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val colByCell = colMatches.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    cells.zipWithIndex.map { case (cell, ci) =>
      val rs = rowByCell.getOrElse(ci, Nil)
      val cs = colByCell.getOrElse(ci, Nil)
      CellSeg(cell.id,
        if (rs.isEmpty) 0 else rs.map(_ + 1).min,
        if (cs.isEmpty) 0 else cs.map(_ + 1).min,
        rs.length, cs.length)
    }
  }

  /** segment.py:587 `create_intersection_cells` via box.py:814: one
    * cell per non-empty row×col intersection, numbered by the sorted
    * item positions.
    */
  def intersectionCells(rows: Seq[Item], cols: Seq[Item]): Seq[(CellSeg, BBox)] = {
    val rowsSorted = rows.sortBy(_.box.cy)
    val colsSorted = cols.sortBy(_.box.cx)
    for {
      (r, ri) <- rowsSorted.zipWithIndex
      (c, ci) <- colsSorted.zipWithIndex
      inter <- Geometry.intersectionBox(r.box, c.box)
    } yield (CellSeg(s"${r.id}x${c.id}", ri + 1, ci + 1, 1, 1), inter)
  }

  /** refine.py:51-348: cells spanning multiple tiles are merged with
    * every cell sharing a tile (connected components via union-find),
    * and each merged group becomes the smallest enclosing rectangle of
    * its tiles (`_tiling_to_cell_position`, refine.py:225-231).
    * Returns merged cell groups: (member ids, row, col, rowSpan,
    * colSpan).
    */
  def refineRectangles(cells: Seq[CellSeg]): Seq[(Seq[String], CellSeg)] = {
    val n = cells.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(rb) = ra }

    def tiles(c: CellSeg): Set[(Int, Int)] =
      (for (dr <- 0 until math.max(1, c.rowSpan); dc <- 0 until math.max(1, c.colSpan))
        yield (c.rowNum + dr, c.colNum + dc)).toSet

    val tileOwner = mutable.Map.empty[(Int, Int), Int]
    for ((c, i) <- cells.zipWithIndex; t <- tiles(c)) {
      tileOwner.get(t) match {
        case Some(j) => union(i, j)
        case None => tileOwner(t) = i
      }
    }
    cells.indices.groupBy(find).toSeq.sortBy(_._2.head).map { case (_, members) =>
      val allTiles = members.flatMap(i => tiles(cells(i)))
      val row = allTiles.map(_._1).min
      val col = allTiles.map(_._2).min
      val rowSpan = allTiles.map(_._1).max - row + 1
      val colSpan = allTiles.map(_._2).max - col + 1
      (members.map(cells(_).id), CellSeg(cells(members.head).id, row, col, rowSpan, colSpan))
    }
  }
}
