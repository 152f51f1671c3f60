package graft.kernels

import scala.collection.mutable
import graft.model.BBox
import Geometry.iou

/** Greedy non-maximum suppression over candidate blocks — semantics of
  * the reference's `pt_nms_image_annotations`
  * (dd_core/mapper/nms.py:64; torchvision greedy NMS underneath):
  * sort by score descending, drop any candidate whose IoU with an
  * already-kept candidate exceeds the threshold. Priority category
  * members get score 1.0 and are never suppressed. Row-local.
  */
object Nms {

  final case class Candidate(id: String, box: BBox, score: Double, category: String)

  /** @return ids of surviving candidates. */
  def suppress(anns: Seq[Candidate], threshold: Double, prio: String = ""): Seq[String] = {
    if (anns.length == 1) return Seq(anns.head.id)
    if (anns.isEmpty) return Nil

    val priorityIds = if (prio.nonEmpty) anns.filter(_.category == prio).map(_.id) else Nil
    if (priorityIds.length == anns.length) return priorityIds

    def confidence(c: Candidate): Double = if (prio.nonEmpty && c.category == prio) 1.0 else c.score

    // stable sort by score descending (torchvision sorts descending;
    // ties keep input order)
    val sorted = anns.sortBy(c => -confidence(c))
    val kept = mutable.ListBuffer.empty[Candidate]
    for (cand <- sorted) {
      val suppressed = kept.exists(k => iou(k.box, cand.box) > threshold)
      if (!suppressed) kept += cand
    }
    val keptIds = kept.map(_.id).toSet
    // preserve priority anns even if greedy would drop them
    val extra = priorityIds.filterNot(keptIds.contains)
    kept.map(_.id).toList ++ extra
  }
}
