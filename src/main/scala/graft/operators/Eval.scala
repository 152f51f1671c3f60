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
