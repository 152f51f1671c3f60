package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Turn
import graft.pipeline.{Extract, ExtractConfig}

/** End-to-end evaluation orchestration — the reference's
  * `Evaluator.run` (deepdoctection/eval/eval.py:57): stream the
  * dataset twice, keep one side as ground truth, strip the other
  * side's annotations, re-run the pipeline on the stripped side, then
  * hand both to the metric.
  *
  * Here the "annotation-erased" side IS the raw turn table (raw turns
  * carry no annotations), so: prediction = `Extract.run(raw)`, golden
  * = the caller's annotated table, joined on (conv_id, turn_idx) —
  * the stable per-turn key the north rule's text-equality invariant
  * is defined over. A FULL OUTER join makes missing/extra turns count
  * against both accuracies instead of silently dropping.
  */
object Evaluator {

  /** Golden side needs columns (conv_id, turn_idx, extractedText,
    * lang). Returns one row: turn counts plus per-field match rates.
    */
  def run(raw: Dataset[Turn], golden: DataFrame,
      cfg: ExtractConfig = ExtractConfig()): DataFrame = {
    val pred = Extract.run(raw, cfg).toDF()
      .select(col("conv_id"), col("turn_idx"),
        col("extractedText").as("p_text"), col("lang").as("p_lang"))
    val gold = golden.select(col("conv_id"), col("turn_idx"),
      col("extractedText").as("g_text"), col("lang").as("g_lang"))
    pred.join(gold, Seq("conv_id", "turn_idx"), "full")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p_text").isNotNull && col("g_text").isNotNull, 1L)
          .otherwise(0L)).as("n_joined"),
        sum(when(col("p_text") === col("g_text"), 1L).otherwise(0L)).as("n_text_match"),
        sum(when(col("p_lang") === col("g_lang"), 1L).otherwise(0L)).as("n_lang_match"))
      .select(col("n"), col("n_joined"), col("n_text_match"), col("n_lang_match"),
        round(col("n_text_match").cast("double") / col("n"), 6).as("text_accuracy"),
        round(col("n_lang_match").cast("double") / col("n"), 6).as("lang_accuracy"))
  }

  /** Per-category variant: evaluates the re-run pipeline's language
    * labels against the golden side with
    * [[Eval.precisionRecallF1ByCategory]] — the `AccuracyMetric` /
    * `F1Metric` path of eval.py wired end-to-end.
    */
  def runPrfByCategory(raw: Dataset[Turn], golden: DataFrame,
      cfg: ExtractConfig = ExtractConfig()): DataFrame = {
    val pred = Extract.run(raw, cfg).toDF()
      .select(col("conv_id"), col("turn_idx"), col("lang").as("v"))
    val gold = golden.select(col("conv_id"), col("turn_idx"), col("lang").as("v"))
    Eval.precisionRecallF1ByCategory(pred, gold, Seq("conv_id", "turn_idx"), "v")
  }
}
