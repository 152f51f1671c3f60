package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.TableGeom
import graft.kernels.TableGeom.{CellSeg, Item}
import graft.model.BBox

class TableGeomSpec extends AnyFunSuite {
  private def b(ulx: Double, uly: Double, lrx: Double, lry: Double) =
    BBox(ulx, uly, lrx, lry, absCoords = true)

  private val table = b(0, 0, 100, 60)
  // two rows, two cols (detector-style, slightly inset)
  private val rows = Seq(Item("r1", b(2, 2, 98, 28), 0.9), Item("r2", b(2, 32, 98, 58), 0.8))
  private val cols = Seq(Item("c1", b(2, 2, 48, 58), 0.9), Item("c2", b(52, 2, 98, 58), 0.8))

  test("choose_items_by_iou keeps higher-score overlap (segment.py:91)") {
    val dup = Item("r1b", b(2, 3, 98, 29), 0.5) // heavy overlap with r1
    val kept = TableGeom.chooseItemsByIou(rows :+ dup, 0.5)
    assert(kept.map(_.id) == Seq("r1", "r2"))
  }

  test("stretch_items snaps rows/cols to table edges (segment.py:150/:443)") {
    val (sr, sc) = TableGeom.stretchItems(table, rows, cols)
    assert(sr.forall(r => r.box.ulx == 0 && r.box.lrx == 100))
    assert(sc.forall(c => c.box.uly == 0 && c.box.lry == 60))
  }

  test("tile_items rule=left and rule=equal (segment.py:399)") {
    val left = TableGeom.tileItems(table, rows, "left")
    assert(left.head.box.uly == 0 && left.last.box.lry == 60)
    assert(left(1).box.uly == left(0).box.lry) // no gaps
    val equal = TableGeom.tileItems(table, rows, "equal")
    assert(equal(1).box.uly == (28.0 + 32.0) / 2)
  }

  test("segment_cells: row/col numbers + spans by weighted IoA (segment.py:492)") {
    val cells = Seq(
      Item("a", b(4, 4, 46, 26), 1.0),   // row1 col1
      Item("d", b(54, 34, 96, 56), 1.0), // row2 col2
      Item("tall", b(54, 4, 96, 56), 1.0)) // spans both rows in col2
    val segs = TableGeom.segmentCells(rows, cols, cells)
    val byId = segs.map(s => s.id -> s).toMap
    assert(byId("a") == CellSeg("a", 1, 1, 1, 1))
    assert(byId("d") == CellSeg("d", 2, 2, 1, 1))
    assert(byId("tall") == CellSeg("tall", 1, 2, 2, 1)) // min row, span 2
  }

  test("intersection cells (pubtables variant, segment.py:587)") {
    val ics = TableGeom.intersectionCells(rows, cols)
    assert(ics.length == 4)
    assert(ics.map(_._1).map(c => (c.rowNum, c.colNum)).toSet ==
      Set((1, 1), (1, 2), (2, 1), (2, 2)))
    val box11 = ics.find(_._1.rowNum == 1).get._2
    assert(box11 == b(2, 2, 48, 28))
  }

  test("refine merges multiply-assigned cells into rectangles (refine.py:51-348)") {
    val cells = Seq(
      CellSeg("a", 1, 1, 1, 1), CellSeg("b", 1, 2, 1, 1),
      CellSeg("wide", 2, 1, 1, 2), // tiles (2,1),(2,2)
      CellSeg("clash", 2, 2, 1, 1)) // shares tile (2,2) with wide → merge
    val refined = TableGeom.refineRectangles(cells)
    assert(refined.length == 3)
    val merged = refined.find(_._1.contains("wide")).get
    assert(merged._1.toSet == Set("wide", "clash"))
    assert(merged._2.rowNum == 2 && merged._2.colNum == 1 &&
      merged._2.rowSpan == 1 && merged._2.colSpan == 2)
  }
}
