package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation operators — the reference's `Evaluator` + accuracy /
  * precision / recall / F1 / confusion metrics
  * (deepdoctection/eval/eval.py:57, eval/accmetric.py:81-226),
  * re-expressed as equi-join + aggregations over (prediction, gold)
  * datasets keyed by (conv_id, turn_idx) / doc_id.
  */
object Eval {

  /** Per-key value-equality accuracy between prediction and gold. */
  def accuracy(pred: DataFrame, gold: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val joined = pred.withColumnRenamed(valueCol, "p")
      .join(gold.withColumnRenamed(valueCol, "g"), keys)
    joined.agg(
      count(lit(1)).as("n"),
      sum(when(col("p") === col("g"), 1).otherwise(0)).as("n_match"),
      round(avg(when(col("p") === col("g"), 1.0).otherwise(0.0)), 4).as("accuracy"))
  }

  /** Confusion matrix over label pairs (accmetric.py:226). */
  def confusion(pred: DataFrame, gold: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    pred.withColumnRenamed(valueCol, "predicted")
      .join(gold.withColumnRenamed(valueCol, "gold"), keys)
      .groupBy("gold", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("gold", "predicted")

  /** PER-CATEGORY precision/recall/F1 (accmetric.py:149-215): derived
    * from the confusion matrix — precision_l = diag/column-sum,
    * recall_l = diag/row-sum, with the reference's
    * `np.nan_to_num(…, nan=1.0)` convention for empty denominators
    * (0/0 → 1.0). F1 is the harmonic mean; where P+R = 0 the reference
    * propagates NaN — we emit 0.0 (the scikit convention) so results
    * stay SQL-comparable; documented divergence.
    *
    * Scale: three key-only aggregations + a broadcast label join; the
    * payload never shuffles more than (label, count).
    */
  def precisionRecallF1ByCategory(pred: DataFrame, gold: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    // FULL OUTER on the keys, like Evaluator.run: a key present on only
    // one side still counts (missing prediction → FN for its gold
    // label; extra prediction → FP for its predicted label) — an inner
    // join would silently inflate both precision and recall
    val joined = pred.withColumnRenamed(valueCol, "p")
      .join(gold.withColumnRenamed(valueCol, "g"), keys, "full")
      .select("p", "g")
    val labels = joined.select(col("p").as("label"))
      .union(joined.select(col("g").as("label")))
      .filter(col("label").isNotNull).distinct()
    val tp = joined.filter(col("p") === col("g"))
      .groupBy(col("g").as("label")).agg(count(lit(1)).as("tp"))
    val predCnt = joined.groupBy(col("p").as("label")).agg(count(lit(1)).as("n_pred"))
    val goldCnt = joined.groupBy(col("g").as("label")).agg(count(lit(1)).as("n_gold"))
    val base = labels
      .join(tp, Seq("label"), "left")
      .join(predCnt, Seq("label"), "left")
      .join(goldCnt, Seq("label"), "left")
      .na.fill(0L, Seq("tp", "n_pred", "n_gold"))
    val prec = when(col("n_pred") === 0, lit(1.0))
      .otherwise(col("tp").cast("double") / col("n_pred"))
    val rec = when(col("n_gold") === 0, lit(1.0))
      .otherwise(col("tp").cast("double") / col("n_gold"))
    base.select(col("label"), col("tp"), col("n_pred"), col("n_gold"),
        prec.as("prec_raw"), rec.as("rec_raw"))
      .select(col("label"), col("tp"), col("n_pred"), col("n_gold"),
        round(col("prec_raw"), 6).as("prec"),
        round(col("rec_raw"), 6).as("rec"),
        round(when(col("prec_raw") + col("rec_raw") === 0, lit(0.0))
          .otherwise(lit(2) * col("prec_raw") * col("rec_raw") /
            (col("prec_raw") + col("rec_raw"))), 6).as("f1"))
      .orderBy("label")
  }

  /** Micro-averaged precision/recall (accmetric.py `micro=True`):
    * diag-sum over total — for single-label-per-key problems this is
    * exactly the accuracy, which is why precision == recall here.
    */
  def microPrecisionRecall(pred: DataFrame, gold: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame =
    pred.withColumnRenamed(valueCol, "p")
      .join(gold.withColumnRenamed(valueCol, "g"), keys)
      .agg(count(lit(1)).as("n"),
        sum(when(col("p") === col("g"), 1L).otherwise(0L)).as("tp"))
      .select(col("n"), col("tp"),
        round(col("tp").cast("double") / col("n"), 6).as("micro_prec"),
        round(col("tp").cast("double") / col("n"), 6).as("micro_rec"))

  /** Binary precision/recall/F1 for one positive label
    * (accmetric.py:81-224).
    */
  def precisionRecallF1(pred: DataFrame, gold: DataFrame, keys: Seq[String],
      valueCol: String, positive: String): DataFrame = {
    val joined = pred.withColumnRenamed(valueCol, "p")
      .join(gold.withColumnRenamed(valueCol, "g"), keys)
      .select((col("p") === positive).cast("int").as("pp"),
        (col("g") === positive).cast("int").as("gp"))
    joined.agg(
      sum(col("pp") * col("gp")).as("tp"),
      sum(col("pp") * (lit(1) - col("gp"))).as("fp"),
      sum((lit(1) - col("pp")) * col("gp")).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        round(col("tp") / greatest(col("tp") + col("fp"), lit(1)), 4).as("precision"),
        round(col("tp") / greatest(col("tp") + col("fn"), lit(1)), 4).as("recall"),
        round(lit(2) * col("tp") / greatest(lit(2) * col("tp") + col("fp") + col("fn"), lit(1)), 4).as("f1"))
  }
}
