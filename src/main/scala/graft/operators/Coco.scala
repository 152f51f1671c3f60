package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** COCO-style detection evaluation — the reference's `CocoMetric`
  * wraps pycocotools `COCOeval`
  * (deepdoctection/eval/cocometric.py:149; algorithm from the
  * public-domain cocoapi). Re-derived Spark-first in two stages:
  *
  *  1. '''Match''' (cogroup kernel, one shuffle on (image, category)):
  *     per image × category, detections sorted by (score desc, det_id)
  *     greedily claim the unmatched ground-truth box with the highest
  *     IoU ≥ threshold — equal-IoU ties go to the LATER gt, exactly as
  *     pycocotools `evaluateImg` — independently per IoU threshold.
  *  2. '''Accumulate''' (window space, one shuffle on (category,
  *     threshold)): detections ranked globally by (score desc,
  *     det_id); precision = cumTP/rank, recall = cumTP/nGt;
  *     interpolated precision = running max from the right (suffix
  *     max); AP = mean of interpolated precision sampled at the 101
  *     recall points 0, 0.01, …, 1.00 (pycocotools `accumulate`);
  *     AR = recall at maxDets.
  *
  * Scale: stage-2's per-category sort is a window PARTITIONED by
  * (category, threshold) — parallel across categories × thresholds,
  * never a global single-task sort; only (score, tp) pairs shuffle.
  * The row-i sample count uses integer grid coverage: grid point k is
  * covered by row i iff k·n_gt ≤ 100·cumTP, evaluated in exact long
  * arithmetic — row i supplies the points k ∈ (100·r_{i−1}, 100·r_i],
  * plus k = 0 for the first row; points above max recall stay 0. This
  * is the rational-arithmetic reformulation of pycocotools'
  * float searchsorted over the recall grid; the float version can
  * diverge by one grid point when 100·recall rounds a hair below an
  * integer (e.g. recall = 29/100), which exact integer division
  * cannot.
  */
object Coco {

  final case class GtBox(img: Long, cat: Int,
      ulx: Double, uly: Double, lrx: Double, lry: Double)
  final case class DetBox(img: Long, cat: Int, detId: Long, score: Double,
      ulx: Double, uly: Double, lrx: Double, lry: Double)

  /** The default COCO IoU thresholds 0.50:0.05:0.95. */
  val DefaultIouThrs: Seq[Double] = (0 until 10).map(i => 0.5 + 0.05 * i)

  private def iouOf(d: DetBox, g: GtBox): Double = {
    val iw = math.min(d.lrx, g.lrx) - math.max(d.ulx, g.ulx)
    val ih = math.min(d.lry, g.lry) - math.max(d.uly, g.uly)
    if (iw <= 0 || ih <= 0) 0.0
    else {
      val inter = iw * ih
      val union = (d.lrx - d.ulx) * (d.lry - d.uly) +
        (g.lrx - g.ulx) * (g.lry - g.uly) - inter
      inter / union
    }
  }

  /** The pycocotools `_COCOEVAL_DEFAULTS` area ranges
    * (cocometric.py:49-62): all / small (<32²) / medium / large.
    */
  val DefaultAreaRanges: Map[String, (Double, Double)] = Map(
    "all" -> (0.0, 1e10), "small" -> (0.0, 1024.0),
    "medium" -> (1024.0, 9216.0), "large" -> (9216.0, 1e10))

  /** The pycocotools maxDets grid (AR@1 / AR@10 / AR@100). */
  val DefaultMaxDets: Seq[Int] = Seq(1, 10, 100)

  private def areaOf(ulx: Double, uly: Double, lrx: Double, lry: Double): Double =
    (lrx - ulx) * (lry - uly)

  /** Stage 1 → (cat, thr, det_id, score, tp, ignored, det_rank).
    *
    * Area-range ignore semantics replicate pycocotools `evaluateImg`:
    * ground truth outside `areaRng` is flagged ignore and sorted LAST
    * (a detection prefers any non-ignored gt; once its best match is
    * non-ignored and the scan reaches the ignored tail, it stops);
    * a detection matched to an ignored gt inherits the ignore flag,
    * an UNMATCHED detection is ignored iff its own area is outside the
    * range. Ignored rows are excluded from PR accumulation entirely —
    * neither tp nor fp.
    *
    * `det_rank` is the detection's (score desc, det_id) rank within its
    * (image, category): greedy matching processes detections in that
    * order, so earlier matches never depend on later detections and
    * truncating at rank ≤ m reproduces matching with only the top-m
    * detections — [[accumulate]] filters on it per maxDets without
    * re-matching (exactly how pycocotools slices dtm[:, 0:maxDet]).
    */
  def matchDetections(gt: Dataset[GtBox], det: Dataset[DetBox],
      iouThrs: Seq[Double] = DefaultIouThrs, maxDets: Int = 100,
      areaRng: (Double, Double) = (0.0, 1e10)): DataFrame = {
    val spark = det.sparkSession
    import spark.implicits._
    val thrs = iouThrs.toArray
    val (aLo, aHi) = areaRng
    gt.groupByKey(g => (g.img, g.cat))
      .cogroup(det.groupByKey(d => (d.img, d.cat))) { case ((_, cat), gs, ds) =>
        val gts0 = gs.toArray
        // INCLUSIVE bounds like pycocotools (ignore iff area<lo or
        // area>hi): a 32×32 box (area 1024.0) counts in BOTH the small
        // and the medium range at the shared boundary
        val ig0 = gts0.map { g =>
          val a = areaOf(g.ulx, g.uly, g.lrx, g.lry); a < aLo || a > aHi
        }
        // stable ignored-last order (pycocotools sorts gt by _ignore)
        val order = gts0.indices.sortBy(ig0(_))
        val gts = order.map(gts0(_)).toArray
        val ig = order.map(ig0(_)).toArray
        val dets = ds.toArray.sortBy(d => (-d.score, d.detId)).take(maxDets)
        thrs.iterator.flatMap { thr =>
          val gtMatched = new Array[Boolean](gts.length)
          dets.iterator.zipWithIndex.map { case (d, di) =>
            // pycocotools cocoeval.py evaluateImg: best-so-far starts at
            // min(thr, 1-1e-10); `< iou → continue` means equal-IoU ties
            // move the match to the later gt
            var best = -1
            var bestIou = math.min(thr, 1 - 1e-10)
            var gi = 0
            var stop = false
            while (gi < gts.length && !stop) {
              if (!gtMatched(gi)) {
                // matched to a real gt and reached the ignored tail →
                // no better match possible (gts sorted ignored-last)
                if (best >= 0 && !ig(best) && ig(gi)) stop = true
                else {
                  val v = iouOf(d, gts(gi))
                  if (v >= bestIou) { bestIou = v; best = gi }
                }
              }
              gi += 1
            }
            val matched = best >= 0
            if (matched) gtMatched(best) = true
            val dIgnored =
              if (matched) ig(best)
              else { val a = areaOf(d.ulx, d.uly, d.lrx, d.lry); a < aLo || a > aHi }
            (cat, thr, d.detId, d.score, matched, dIgnored, di + 1)
          }
        }
      }
      .toDF("cat", "thr", "det_id", "score", "tp", "ignored", "det_rank")
  }

  /** Stage 2 → (cat, thr, n_gt, ap, ar). `gtCounts` = (cat, n_gt)
    * where n_gt counts the NON-ignored ground truth for the area range
    * the matching ran with. Categories × thresholds with ground truth
    * but no detections get ap = ar = 0 (pycocotools yields -1 there
    * only when there is no gt at all; zero-gt categories are dropped
    * like COCOeval does).
    */
  def accumulate(matched: DataFrame, gtCounts: DataFrame,
      iouThrs: Seq[Double] = DefaultIouThrs, maxDets: Int = 100): DataFrame = {
    val w = Window.partitionBy("cat", "thr").orderBy(desc("score"), col("det_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSuf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // ignored detections are outside the PR curve entirely; det_rank >
    // maxDets reproduces pycocotools' dtm[:, 0:maxDet] truncation
    val ranked = matched
      .filter(!col("ignored") && col("det_rank") <= maxDets)
      .join(broadcast(gtCounts), "cat")
      .withColumn("rn", row_number().over(w))
      .withColumn("cumtp", sum(col("tp").cast("long")).over(wCum))
      .withColumn("prec_i", col("cumtp").cast("double") / col("rn"))
      .withColumn("recall_i", col("cumtp").cast("double") / col("n_gt").cast("double"))
      .withColumn("pmax", max("prec_i").over(wSuf))
      .withColumn("prev_cumtp", coalesce(lag("cumtp", 1).over(w), lit(0L)))
    // integer grid coverage (see object doc): k covered ⟺ k·n_gt ≤
    // 100·cumtp, so row i covers (cumtp·100 div n_gt) −
    // (prev_cumtp·100 div n_gt) points — exact long arithmetic, no
    // float-floor boundary cases
    val cover = expr("(cumtp * 100L) div n_gt") - expr("(prev_cumtp * 100L) div n_gt") +
      when(col("rn") === 1, 1).otherwise(0)
    val perGroup = ranked.groupBy("cat", "thr", "n_gt")
      .agg((sum(col("pmax") * cover) / 101.0).as("ap"),
        (max("cumtp").cast("double") / first(col("n_gt")).cast("double")).as("ar"))
    // fill (cat, thr) combinations that produced no detections
    val spark = matched.sparkSession
    import spark.implicits._
    val grid = gtCounts.filter(col("n_gt") > 0).crossJoin(iouThrs.toDF("thr"))
    grid.join(perGroup.drop("n_gt"), Seq("cat", "thr"), "left")
      .select(col("cat"), col("thr"), col("n_gt"),
        coalesce(col("ap"), lit(0.0)).as("ap"),
        coalesce(col("ar"), lit(0.0)).as("ar"))
      .orderBy("cat", "thr")
  }

  /** Non-ignored gt count per category for an area range (inclusive
    * bounds, matching [[matchDetections]]'s pycocotools semantics).
    */
  def gtCountsInRange(gt: Dataset[GtBox], areaRng: (Double, Double)): DataFrame = {
    val area = (col("lrx") - col("ulx")) * (col("lry") - col("uly"))
    gt.toDF().filter(area >= areaRng._1 && area <= areaRng._2)
      .groupBy("cat").agg(count(lit(1)).as("n_gt"))
  }

  /** The full COCOeval summary surface over a (gt, det) pair — the 12
    * standard rows (`_COCOEVAL_DEFAULTS`, cocometric.py:49-62 /
    * pycocotools summarize): AP@[.50:.95], AP50, AP75,
    * AP-small/medium/large, AR@1, AR@10, AR@100,
    * AR-small/medium/large (@100). Means over categories with ground
    * truth in the range, like COCOeval (zero-gt categories excluded).
    */
  def summary(gt: Dataset[GtBox], det: Dataset[DetBox],
      maxDets: Int = 100): DataFrame = {
    // ONE matchDetections (the expensive cogroup) per area range —
    // the ap_* and ar_* rows of a range share its accumulate, and the
    // 'all' rows (ap/ap50/ap75 + the AR@m family) share one matched
    // DataFrame across the maxDets variants
    def per(areaRng: (Double, Double)) = accumulate(
      matchDetections(gt, det, DefaultIouThrs, maxDets, areaRng),
      gtCountsInRange(gt, areaRng), DefaultIouThrs, maxDets)
    // a range with no ground truth at all yields -1, pycocotools'
    // empty-slice convention
    def row(name: String, df: DataFrame, colName: String) =
      df.agg(coalesce(avg(colName), lit(-1.0)).as("v"))
        .select(lit(name).as("metric"), col("v"))

    val matchedAll = matchDetections(gt, det, DefaultIouThrs, maxDets,
      DefaultAreaRanges("all"))
    val gtAll = gtCountsInRange(gt, DefaultAreaRanges("all"))
    val all = accumulate(matchedAll, gtAll, DefaultIouThrs, maxDets)
    val subRanges = DefaultAreaRanges.toSeq.sortBy(_._1)
      .collect { case (label, rng) if label != "all" => label -> per(rng) }
    val rows =
      row("ap", all, "ap") ::
      row("ap50", all.filter(col("thr") === 0.5), "ap") ::
      row("ap75", all.filter(col("thr") === 0.75), "ap") ::
      subRanges.map { case (label, acc) => row(s"ap_$label", acc, "ap") }.toList :::
      // matchedAll is truncated at the caller's maxDets, so an AR row
      // at m > maxDets would silently report AR@maxDets under the
      // 'ar<m>' label — derive the effective rank (and its label) from
      // min(m, maxDets) instead
      DefaultMaxDets.toList.map(m => math.min(m, maxDets)).distinct.map(m =>
        row(s"ar$m", accumulate(matchedAll, gtAll, DefaultIouThrs, m), "ar")) :::
      subRanges.map { case (label, acc) => row(s"ar_$label", acc, "ar") }.toList
    rows.reduce(_ unionByName _)
      .select(col("metric"), round(col("v"), 6).as("value"))
  }
}
