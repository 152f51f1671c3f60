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

  // ---- deskew angle ESTIMATION (extern/deskew.py:80 `predict` — the
  // reference rounds jdeskew's projection-profile angle to 4 dp and
  // rotates when |angle| > min_angle_rotation=2.0). jdeskew's method
  // (Pham et al., "Adaptive Radial Projection on Fourier Magnitude
  // Spectrum" — publicly documented; classical equivalent: projection-
  // profile variance maximization, Baird 1987) works on pixels; this
  // engine has the WORD BOXES instead, which carry the same line
  // structure, so the estimator maximizes the projection-profile
  // concentration of word-box centers over candidate angles ----

  /** Estimate the clockwise skew angle (degrees, ±`maxAngle`) of a set
    * of word boxes: for each candidate θ, un-rotate the box centers by
    * θ, histogram their y' into `binSize`-tall bins, and score by the
    * sum of squared bin counts — maximal when text lines collapse onto
    * few bins, i.e. when θ matches the planted skew. Coarse 0.5° sweep,
    * then two refinement passes (0.1°, 0.02°); result rounded to 4 dp
    * like the reference. Returns 0.0 for <3 boxes (nothing to align).
    */
  def estimateSkew(words: Seq[BBox], maxAngle: Double = 15.0): Double = {
    if (words.size < 3) return 0.0
    val cx = words.map(b => (b.ulx + b.lrx) / 2).toArray
    val cy = words.map(b => (b.uly + b.lry) / 2).toArray
    // bin at the typical word height: fine enough to separate lines,
    // coarse enough that in-line jitter stays in one bin
    val heights = words.map(b => b.lry - b.uly).sorted
    val binSize = math.max(1.0, heights(heights.size / 2) * 0.8)
    val n = cx.length
    def score(thetaDeg: Double): Double = {
      val t = math.toRadians(thetaDeg)
      val (c, s) = (math.cos(t), math.sin(t))
      // inverse of the clockwise rotation: y' = −x·s + y·c; each
      // center's weight splits linearly between its two nearest bins
      // (subpixel binning) so the score is CONTINUOUS in θ and the
      // refinement sweeps have a real gradient to climb — hard binning
      // plateaus on small word sets
      val counts = scala.collection.mutable.HashMap.empty[Int, Double]
      var i = 0
      var minY = Double.MaxValue
      val ys = new Array[Double](n)
      while (i < n) {
        ys(i) = -cx(i) * s + cy(i) * c
        if (ys(i) < minY) minY = ys(i)
        i += 1
      }
      i = 0
      while (i < n) {
        val pos = (ys(i) - minY) / binSize
        val bin = pos.toInt
        val frac = pos - bin
        counts.update(bin, counts.getOrElse(bin, 0.0) + (1.0 - frac))
        counts.update(bin + 1, counts.getOrElse(bin + 1, 0.0) + frac)
        i += 1
      }
      var acc = 0.0
      counts.valuesIterator.foreach(v => acc += v * v)
      acc
    }
    def sweep(center: Double, halfSpan: Double, step: Double): Double = {
      var best = center
      var bestScore = Double.MinValue
      var a = center - halfSpan
      while (a <= center + halfSpan + 1e-9) {
        val sc = score(a)
        if (sc > bestScore) { bestScore = sc; best = a }
        a += step
      }
      best
    }
    val coarse = sweep(0.0, maxAngle, 0.5)
    val mid = sweep(coarse, 0.5, 0.1)
    val fine = sweep(mid, 0.1, 0.02)
    math.rint(fine * 10000) / 10000
  }

  /** The deskew SERVICE semantics (`Jdeskewer.transform_image` +
    * `predict`): estimate the skew from the turn's word boxes and,
    * when it exceeds `minAngleRotation` (reference default 2.0°),
    * re-emit every box un-rotated by that angle (the coordinate
    * analogue of rotating the image level). Returns the estimated
    * angle alongside the (possibly untouched) turn.
    */
  def deskewTurn(et: ExtractedTurn, pageW: Double, pageH: Double,
      minAngleRotation: Double = 2.0): (Double, ExtractedTurn) = {
    val angle = estimateSkew(et.words.map(_.box))
    if (math.abs(angle) <= minAngleRotation) (angle, et)
    else (angle, et.copy(
      blocks = et.blocks.map(b => b.copy(box = rotateBoxAngle(b.box, -angle, pageW, pageH))),
      words = et.words.map(w => w.copy(box = rotateBoxAngle(w.box, -angle, pageW, pageH)))))
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
