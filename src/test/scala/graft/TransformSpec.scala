package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{Segment, Transform}
import graft.model.BBox

/** Mirrors the reference's SimpleTransformService semantics
  * (tests/pipe/test_transform.py): page dims swap under 90° rotations
  * (the mocked predictor's new_h/new_w), every annotation box is
  * re-emitted in the transformed frame, and the original geometry is
  * recoverable (the reference keeps it as a deactivated annotation;
  * here the inverse rotation restores it exactly).
  */
class TransformSpec extends AnyFunSuite {

  private val W = 1000.0
  private val H = 600.0

  test("rotated page dims swap exactly at odd quarter turns") {
    assert(Transform.rotatedDims(90, W, H) == ((H, W)))
    assert(Transform.rotatedDims(180, W, H) == ((W, H)))
    assert(Transform.rotatedDims(270, W, H) == ((H, W)))
    assert(Transform.rotatedDims(-90, W, H) == ((H, W)))
  }

  test("90° clockwise moves the top-left box to the top-right corner") {
    val b = BBox(0, 0, 100, 50, absCoords = true)
    // page 1000×600 → rotated page 600×1000; the old top edge becomes
    // the right edge: x' = H − y_bottom … H − y_top, y' = old x
    assert(Transform.rotateBox(b, 90, W, H) == BBox(550, 0, 600, 100, absCoords = true))
    assert(Transform.rotateBox(b, 180, W, H) == BBox(900, 550, 1000, 600, absCoords = true))
    assert(Transform.rotateBox(b, 270, W, H) == BBox(0, 900, 50, 1000, absCoords = true))
  }

  test("arbitrary-angle rotation: 30° pinned against hand-computed values") {
    // 20×10 box at (10,10) in a 100×100 page, 30° clockwise.
    // cos=√3/2, sin=1/2 → expanded frame 50(√3+1) square; corners
    // rotated about the center, bounding box taken.
    val b = Transform.rotateBoxAngle(
      BBox(10, 10, 30, 20, absCoords = true), 30.0, 100, 100)
    val eps = 1e-6
    assert(math.abs(b.ulx - 48.660254) < eps, b.toString)
    assert(math.abs(b.uly - 13.660254) < eps, b.toString)
    assert(math.abs(b.lrx - 70.980762) < eps, b.toString)
    assert(math.abs(b.lry - 32.320508) < eps, b.toString)
    val (rw, rh) = Transform.rotatedDimsAngle(30.0, 100, 100)
    assert(math.abs(rw - 136.602540) < eps && math.abs(rh - 136.602540) < eps)
  }

  test("arbitrary-angle round trip: unrotate(rotate(b)) ⊇ b, equality at right angles") {
    val boxes = Seq(
      BBox(10, 10, 30, 20, absCoords = true),
      BBox(0, 0, 100, 50, absCoords = true),
      BBox(412.5, 87.25, 613.75, 402.5, absCoords = true))
    val eps = 1e-9
    for (b <- boxes; angle <- Seq(7.3, 30.0, 45.0, 61.7, 119.9, 213.4, 359.5)) {
      val rt = Transform.unrotateBoxAngle(
        Transform.rotateBoxAngle(b, angle, W, H), angle, W, H)
      // ⊇: each side at or beyond the original
      assert(rt.ulx <= b.ulx + eps && rt.uly <= b.uly + eps &&
        rt.lrx >= b.lrx - eps && rt.lry >= b.lry - eps,
        s"round trip at $angle° lost coverage: $b → $rt")
    }
    for (b <- boxes; angle <- Seq(0.0, 90.0, 180.0, 270.0)) {
      // right angles delegate to the exact integer path — EQUALITY
      assert(Transform.rotateBoxAngle(b, angle, W, H) ==
        Transform.rotateBox(b, angle.toInt, W, H))
      assert(Transform.unrotateBoxAngle(
        Transform.rotateBoxAngle(b, angle, W, H), angle, W, H) == b)
    }
  }

  test("rotation preserves area and containment; inverse restores exactly") {
    val outer = BBox(100, 100, 400, 300, absCoords = true)
    val inner = BBox(150, 120, 200, 140, absCoords = true)
    for (angle <- Seq(90, 180, 270)) {
      val ro = Transform.rotateBox(outer, angle, W, H)
      val ri = Transform.rotateBox(inner, angle, W, H)
      assert(math.abs(ro.area - outer.area) < 1e-9)
      // containment survives the frame change
      assert(ri.ulx >= ro.ulx && ri.uly >= ro.uly && ri.lrx <= ro.lrx && ri.lry <= ro.lry)
      // deactivated-original equivalence: the inverse is exact
      assert(Transform.unrotateBox(ro, angle, W, H) == outer)
      assert(Transform.unrotateBox(ri, angle, W, H) == inner)
    }
  }

  test("four quarter turns compose to the identity") {
    var b = BBox(37, 83, 312, 95, absCoords = true)
    var (w, h) = (W, H)
    for (_ <- 1 to 4) {
      b = Transform.rotateBox(b, 90, w, h)
      val d = Transform.rotatedDims(90, w, h); w = d._1; h = d._2
    }
    assert(b == BBox(37, 83, 312, 95, absCoords = true))
  }

  test("rotateTurn re-emits every block and word box; words stay inside parents") {
    val et = graft.pipeline.Extract.extractTurn(graft.model.Turn(
      "c", 0, "user", "<p>alpha beta gamma</p><p>delta</p>", "",
      new java.sql.Timestamp(0L)))
    val seg = Segment.segment("<p>alpha beta gamma</p><p>delta</p>")
    val rotated = Transform.rotateTurn(et, 90, seg.pageWidth, seg.pageHeight)
    assert(rotated.blocks.length == et.blocks.length)
    assert(rotated.words.length == et.words.length)
    val blockById = rotated.blocks.map(b => b.id -> b.box).toMap
    for (w <- rotated.words if w.blockId.nonEmpty && blockById.contains(w.blockId)) {
      val pb = blockById(w.blockId)
      assert(w.box.ulx >= pb.ulx - 1e-9 && w.box.lrx <= pb.lrx + 1e-9 &&
        w.box.uly >= pb.uly - 1e-9 && w.box.lry <= pb.lry + 1e-9)
    }
    // text-side outputs are untouched by a pure geometric transform
    assert(rotated.extractedText == et.extractedText)
  }

  test("non-right angles are rejected, not silently approximated") {
    val e = intercept[IllegalArgumentException] {
      Transform.rotateBox(BBox(0, 0, 1, 1, absCoords = true), 45, W, H)
    }
    assert(e.getMessage.contains("right-angle"))
  }

  /** Synthetic word grid (`rows`×`cols`, deterministic ±jitter) skewed
    * clockwise by `angle` about the page center — the planted input the
    * estimator must invert.
    */
  private def skewedGrid(angle: Double, rows: Int = 10, cols: Int = 14): Seq[BBox] = {
    val grid = for (r <- 0 until rows; c <- 0 until cols) yield {
      val jx = (r * 31 + c * 17) % 5 - 2.0 // deterministic jitter ±2px
      val jy = (r * 13 + c * 7) % 3 - 1.0
      val x = 60.0 + c * 62 + jx
      val y = 80.0 + r * 34 + jy
      BBox(x, y, x + 46, y + 14, absCoords = true)
    }
    if (angle == 0.0) grid
    else grid.map(Transform.rotateBoxAngle(_, angle, 1000, 500))
  }

  test("deskew estimator recovers a planted skew within ±0.5° on synthetic word grids") {
    for (planted <- Seq(-12.0, -7.3, -2.0, 0.0, 1.6, 4.25, 9.8)) {
      val est = Transform.estimateSkew(skewedGrid(planted))
      assert(math.abs(est - planted) <= 0.5,
        s"planted $planted° estimated $est°")
    }
    // every integer angle q_deskew's oracle plants must round back
    // exactly (error well inside the 0.5 rounding boundary)
    for (mag <- 3 to 9; sign <- Seq(-1, 1)) {
      val planted = (sign * mag).toDouble
      val est = Transform.estimateSkew(skewedGrid(planted))
      assert(math.abs(est - planted) <= 0.4,
        s"planted $planted° estimated $est° (oracle rounds to int)")
    }
    // degenerate inputs: nothing to align → 0, not noise
    assert(Transform.estimateSkew(Nil) == 0.0)
    assert(Transform.estimateSkew(Seq(BBox(0, 0, 10, 10, absCoords = true))) == 0.0)
  }

  test("deskewTurn: below min_angle_rotation leaves boxes untouched, above re-levels them") {
    val et0 = graft.pipeline.Extract.extractTurn(graft.model.Turn(
      "c", 0, "user", "<p>alpha beta gamma delta epsilon zeta</p><p>eta theta iota kappa lambda mu</p><p>nu xi omicron pi rho sigma</p>", "",
      new java.sql.Timestamp(0L)))
    // level input: |estimate| ≤ 2.0 (reference min_angle_rotation) → untouched
    val (a0, same) = Transform.deskewTurn(et0, 1000, 1000)
    assert(math.abs(a0) <= 2.0 && (same eq et0))
    // skew the word boxes 6° clockwise; the service must re-level them:
    // after deskew, each original text line's words share a y-band again
    val skewed = et0.copy(words = et0.words.map(w =>
      w.copy(box = Transform.rotateBoxAngle(w.box, 6.0, 1000, 1000))))
    val (a1, leveled) = Transform.deskewTurn(skewed, 1000, 1000)
    assert(math.abs(a1 - 6.0) <= 0.5, s"estimated $a1 for planted 6.0")
    val byLine = leveled.words.zip(et0.words).groupBy(_._2.box.uly)
    for ((_, ws) <- byLine if ws.size > 1) {
      val centers = ws.map { case (w, _) => (w.box.uly + w.box.lry) / 2 }
      assert(centers.max - centers.min < 8.0,
        s"line not re-leveled: centers $centers")
    }
  }
}
