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

  /** Stage 1 → (cat, thr, det_id, score, tp). */
  def matchDetections(gt: Dataset[GtBox], det: Dataset[DetBox],
      iouThrs: Seq[Double] = DefaultIouThrs, maxDets: Int = 100): DataFrame = {
    val spark = det.sparkSession
    import spark.implicits._
    val thrs = iouThrs.toArray
    gt.groupByKey(g => (g.img, g.cat))
      .cogroup(det.groupByKey(d => (d.img, d.cat))) { case ((_, cat), gs, ds) =>
        val gts = gs.toArray
        val dets = ds.toArray.sortBy(d => (-d.score, d.detId)).take(maxDets)
        thrs.iterator.flatMap { thr =>
          val gtMatched = new Array[Boolean](gts.length)
          dets.iterator.map { d =>
            // pycocotools cocoeval.py evaluateImg: best-so-far starts at
            // min(thr, 1-1e-10); `< iou → continue` means equal-IoU ties
            // move the match to the later gt
            var best = -1
            var bestIou = math.min(thr, 1 - 1e-10)
            var gi = 0
            while (gi < gts.length) {
              if (!gtMatched(gi)) {
                val v = iouOf(d, gts(gi))
                if (v >= bestIou) { bestIou = v; best = gi }
              }
              gi += 1
            }
            if (best >= 0) gtMatched(best) = true
            (cat, thr, d.detId, d.score, best >= 0)
          }
        }
      }
      .toDF("cat", "thr", "det_id", "score", "tp")
  }

  /** Stage 2 → (cat, thr, n_gt, ap, ar). `gtCounts` = (cat, n_gt).
    * Categories × thresholds with ground truth but no detections get
    * ap = ar = 0 (pycocotools yields -1 there only when there is no gt
    * at all; callers filter on n_gt > 0 like COCOeval does).
    */
  def accumulate(matched: DataFrame, gtCounts: DataFrame,
      iouThrs: Seq[Double] = DefaultIouThrs): DataFrame = {
    val w = Window.partitionBy("cat", "thr").orderBy(desc("score"), col("det_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSuf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ranked = matched.join(broadcast(gtCounts), "cat")
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
    val grid = gtCounts.crossJoin(iouThrs.toDF("thr"))
    grid.join(perGroup.drop("n_gt"), Seq("cat", "thr"), "left")
      .select(col("cat"), col("thr"), col("n_gt"),
        coalesce(col("ap"), lit(0.0)).as("ap"),
        coalesce(col("ar"), lit(0.0)).as("ar"))
      .orderBy("cat", "thr")
  }

  /** COCOeval-summary rows over a (gt, det) pair: AP@[.50:.95], AP50,
    * AP75, AR@maxDets — mean over categories with ground truth
    * (`_COCOEVAL_DEFAULTS`, cocometric.py:49-62).
    */
  def summary(gt: Dataset[GtBox], det: Dataset[DetBox],
      maxDets: Int = 100): DataFrame = {
    val gtCounts = gt.toDF().groupBy("cat").agg(count(lit(1)).as("n_gt"))
    val per = accumulate(
      matchDetections(gt, det, DefaultIouThrs, maxDets), gtCounts, DefaultIouThrs)
    val ap = per.agg(avg("ap").as("v")).select(lit("ap").as("metric"), col("v"))
    val ap50 = per.filter(col("thr") === 0.5).agg(avg("ap").as("v"))
      .select(lit("ap50").as("metric"), col("v"))
    val ap75 = per.filter(col("thr") === 0.75).agg(avg("ap").as("v"))
      .select(lit("ap75").as("metric"), col("v"))
    val ar = per.agg(avg("ar").as("v")).select(lit(s"ar$maxDets").as("metric"), col("v"))
    ap.unionByName(ap50).unionByName(ap75).unionByName(ar)
      .select(col("metric"), round(col("v"), 6).as("value"))
  }
}
