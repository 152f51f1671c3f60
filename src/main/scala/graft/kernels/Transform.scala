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
