package graft.kernels

import scala.collection.mutable
import graft.model.BBox
import Geometry.{intersectionArea, area, iou => boxIou}

/** Parent↔child assignment by intersection — re-derivation of the
  * reference's `match_anns_by_intersection`
  * (dd_core/mapper/match.py:38-166), including the weighted-IoA
  * calibration (:154-160) and the `max_parent_only` argmax (:141-151).
  *
  * In the reference this is an O(P×C) numpy matrix *within one record*;
  * here it stays row-local: plain nested loops over the per-turn
  * arrays inside `mapPartitions` — no shuffle (SURVEY §2.3).
  */
object Match {

  /** @return (childIdx, parentIdx) pairs, in row-major (child-major)
    *         order for the matrix variants — matching numpy
    *         `nonzero()` ordering.
    */
  def matchByIntersection(
      parents: IndexedSeq[BBox],
      children: IndexedSeq[BBox],
      rule: String, // "iou" | "ioa"
      threshold: Double,
      useWeightedIntersections: Boolean = false,
      maxParentOnly: Boolean = false
  ): Seq[(Int, Int)] = {
    require(rule == "iou" || rule == "ioa", "matching rule must be either iou or ioa")
    if (parents.isEmpty || children.isEmpty) return Nil
    val nC = children.length
    val nP = parents.length

    if (rule == "iou") {
      val out = mutable.ListBuffer.empty[(Int, Int)]
      var c = 0
      while (c < nC) {
        var p = 0
        while (p < nP) {
          if (boxIou(children(c), parents(p)) > threshold) out += ((c, p))
          p += 1
        }
        c += 1
      }
      out.toList
    } else {
      // ioa matrix transposed: m(c)(p) = |parent_p ∩ child_c| / |child_c|
      val m = Array.ofDim[Double](nC, nP)
      var c = 0
      while (c < nC) {
        val childArea = area(children(c))
        var p = 0
        while (p < nP) {
          m(c)(p) = if (childArea <= 0.0) 0.0 else intersectionArea(parents(p), children(c)) / childArea
          p += 1
        }
        c += 1
      }
      if (maxParentOnly) {
        // match.py:141-151: zero out below-threshold, argmax per child
        // (first max wins, as numpy argmax), skip children with no match
        val out = mutable.ListBuffer.empty[(Int, Int)]
        c = 0
        while (c < nC) {
          var best = -1
          var bestV = 0.0
          var p = 0
          while (p < nP) {
            val v = if (m(c)(p) < threshold) 0.0 else m(c)(p)
            if (v > bestV) { bestV = v; best = p }
            p += 1
          }
          if (best >= 0) out += ((c, best))
          c += 1
        }
        out.toList
      } else {
        val weighted =
          if (!useWeightedIntersections) m
          else {
            // match.py:154-160: multiply each row by its non-zero count
            m.map { row =>
              val k = row.count(_ != 0.0).toDouble
              row.map(_ * k)
            }
          }
        val out = mutable.ListBuffer.empty[(Int, Int)]
        c = 0
        while (c < nC) {
          var p = 0
          while (p < nP) {
            if (weighted(c)(p) > threshold) out += ((c, p))
            p += 1
          }
          c += 1
        }
        out.toList
      }
    }
  }

  /** match.py:170 `match_anns_by_distance` — nearest parent by center
    * Euclidean distance (cdist argmin, :209-213).
    */
  def matchByDistance(parents: IndexedSeq[BBox], children: IndexedSeq[BBox]): Seq[(Int, Int)] = {
    if (parents.isEmpty || children.isEmpty) return Nil
    children.indices.map { c =>
      val ch = children(c)
      var best = 0
      var bestD = Double.MaxValue
      var p = 0
      while (p < parents.length) {
        val dx = parents(p).cx - ch.cx
        val dy = parents(p).cy - ch.cy
        val d = dx * dx + dy * dy
        if (d < bestD) { bestD = d; best = p }
        p += 1
      }
      (c, best)
    }
  }
}
