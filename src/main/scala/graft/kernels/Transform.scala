package graft.kernels

import graft.model.{BBox, ExtractedTurn}

/** Geometric transform slot — the `SimpleTransformService` +
  * `extern/deskew.py` analogue (deepdoctection/pipe/transform.py:55-96):
  * the reference predicts a rotation, replaces the image with the
  * rotated one, re-emits every annotation's box in the transformed
  * frame, and deactivates the originals. The text analogue (NFC +
  * offset remap) already exists in [[Normalize]]; this is the
  * GEOMETRIC path. Right-angle rotations need no image codecs, so the
  * coordinate re-emission — the part a coordinate-consuming pipeline
  * actually depends on — is real and exactly invertible; arbitrary-
  * angle deskew would only change [[rotateBox]]'s arithmetic.
  *
  * Row-local pure functions: safe inside `map` at any scale.
  */
object Transform {

  /** Page dimensions after rotating a (w, h) page by `angle`. */
  def rotatedDims(angle: Int, pageW: Double, pageH: Double): (Double, Double) =
    if (norm(angle) % 180 == 0) (pageW, pageH) else (pageH, pageW)

  private def norm(angle: Int): Int = ((angle % 360) + 360) % 360

  /** Rotate an ABSOLUTE box clockwise by a right-angle multiple within
    * a (pageW, pageH) frame; the result is in the rotated frame
    * (whose dims are [[rotatedDims]]). transform.py's
    * `transform_coords` for the 90° family.
    */
  def rotateBox(b: BBox, angle: Int, pageW: Double, pageH: Double): BBox = {
    require(b.absCoords, "rotateBox expects absolute coordinates")
    norm(angle) match {
      case 0 => b
      case 90 => BBox(pageH - b.lry, b.ulx, pageH - b.uly, b.lrx, absCoords = true)
      case 180 => BBox(pageW - b.lrx, pageH - b.lry, pageW - b.ulx, pageH - b.uly, absCoords = true)
      case 270 => BBox(b.uly, pageW - b.lrx, b.lry, pageW - b.ulx, absCoords = true)
      case other => throw new IllegalArgumentException(
        s"right-angle rotations only (got $other°) — arbitrary-angle deskew " +
          "needs the image codecs this sandbox lacks")
    }
  }

  /** The inverse rotation (rotating back by 360 − angle in the rotated
    * frame restores the original box — TransformSpec pins it).
    */
  def unrotateBox(b: BBox, angle: Int, pageW: Double, pageH: Double): BBox = {
    val (rw, rh) = rotatedDims(angle, pageW, pageH)
    rotateBox(b, 360 - norm(angle), rw, rh)
  }

  // ---- arbitrary-angle rotation (the `extern/deskew.py` slot): only
  // the angle ESTIMATOR is model territory; the coordinate transform a
  // deskew service re-emits is pure trigonometry ----

  private def isRightAngle(angleDeg: Double): Boolean =
    angleDeg == math.rint(angleDeg) && math.rint(angleDeg).toLong % 90 == 0

  /** Page dimensions after rotating a (w, h) page clockwise by any
    * angle — the rotate-and-expand frame (image rotation without
    * cropping): W' = w·|cos θ| + h·|sin θ|, H' = w·|sin θ| + h·|cos θ|.
    * Exact integers at right angles (delegates to [[rotatedDims]]).
    */
  def rotatedDimsAngle(angleDeg: Double, pageW: Double, pageH: Double): (Double, Double) =
    if (isRightAngle(angleDeg)) rotatedDims(math.rint(angleDeg).toInt, pageW, pageH)
    else {
      val t = math.toRadians(angleDeg)
      val (c, s) = (math.abs(math.cos(t)), math.abs(math.sin(t)))
      (pageW * c + pageH * s, pageW * s + pageH * c)
    }

  /** Rotate an ABSOLUTE box clockwise by ANY angle within a (pageW,
    * pageH) frame: rotate its four corners about the page center into
    * the expanded frame ([[rotatedDimsAngle]]) and take their bounding
    * box — an axis-aligned box is not closed under rotation, so the
    * result is the tightest cover (deskew.py's re-emission semantics).
    * Exact right angles delegate to the integer path (no sin/cos
    * rounding at 90° multiples).
    */
  def rotateBoxAngle(b: BBox, angleDeg: Double, pageW: Double, pageH: Double): BBox =
    if (isRightAngle(angleDeg)) rotateBox(b, math.rint(angleDeg).toInt, pageW, pageH)
    else {
      require(b.absCoords, "rotateBoxAngle expects absolute coordinates")
      val t = math.toRadians(angleDeg)
      val (c, s) = (math.cos(t), math.sin(t))
      val (rw, rh) = rotatedDimsAngle(angleDeg, pageW, pageH)
      val (cx, cy) = (pageW / 2, pageH / 2)
      val (rcx, rcy) = (rw / 2, rh / 2)
      // screen coords (y down): clockwise is dx' = dx·c − dy·s,
      // dy' = dx·s + dy·c — matches rotateBox at the right angles
      val xs = new Array[Double](4)
      val ys = new Array[Double](4)
      var i = 0
      while (i < 4) {
        val x = (if (i % 2 == 0) b.ulx else b.lrx) - cx
        val y = (if (i < 2) b.uly else b.lry) - cy
        xs(i) = rcx + x * c - y * s
        ys(i) = rcy + x * s + y * c
        i += 1
      }
      BBox(xs.min, ys.min, xs.max, ys.max, absCoords = true)
    }

  /** Inverse point map back into the ORIGINAL (origPageW, origPageH)
    * frame. Because each direction takes a bounding box, the
    * round-trip can only grow: `unrotate(rotate(b)) ⊇ b`, with
    * equality at right angles (TransformSpec property).
    */
  def unrotateBoxAngle(b: BBox, angleDeg: Double,
      origPageW: Double, origPageH: Double): BBox =
    if (isRightAngle(angleDeg)) unrotateBox(b, math.rint(angleDeg).toInt, origPageW, origPageH)
    else {
      require(b.absCoords, "unrotateBoxAngle expects absolute coordinates")
      val t = math.toRadians(angleDeg)
      val (c, s) = (math.cos(t), math.sin(t))
      val (rw, rh) = rotatedDimsAngle(angleDeg, origPageW, origPageH)
      val (cx, cy) = (origPageW / 2, origPageH / 2)
      val (rcx, rcy) = (rw / 2, rh / 2)
      val xs = new Array[Double](4)
      val ys = new Array[Double](4)
      var i = 0
      while (i < 4) {
        val x = (if (i % 2 == 0) b.ulx else b.lrx) - rcx
        val y = (if (i < 2) b.uly else b.lry) - rcy
        // transpose of the forward rotation (rotations are orthogonal)
        xs(i) = cx + x * c + y * s
        ys(i) = cy - x * s + y * c
        i += 1
      }
      BBox(xs.min, ys.min, xs.max, ys.max, absCoords = true)
    }

  /** `SimpleTransformService.serve` on the extracted view: every
    * block/word box re-emitted in the rotated frame. The reference
    * keeps deactivated originals alongside; in the columnar model the
    * replaced boxes ARE the re-emission and the original is recovered
    * exactly by [[unrotateBox]] (lossless), which is the property the
    * deactivated originals exist to preserve.
    */
  def rotateTurn(et: ExtractedTurn, angle: Int,
      pageW: Double, pageH: Double): ExtractedTurn =
    et.copy(
      blocks = et.blocks.map(b => b.copy(box = rotateBox(b.box, angle, pageW, pageH))),
      words = et.words.map(w => w.copy(box = rotateBox(w.box, angle, pageW, pageH))))
}
