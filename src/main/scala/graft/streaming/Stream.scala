package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import graft.model.{ExtractedTurn, Turn}
import graft.pipeline.{Extract, ExtractConfig}

/** Structured Streaming surface. The reference is batch-only (its
  * "streaming" means constant-memory iteration — SURVEY §2.5), so this
  * is an extension the 100 TB deployment needs: continuous extraction
  * over arriving transcript files and watermarked windowed aggregation
  * over the event stream. The SAME per-turn kernel runs in both modes
  * — `Extract.extractTurn` inside `mapPartitions` is mode-agnostic.
  */
object Stream {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampType)))

  /** Continuous extraction: file stream of turn .jsonl → per-turn
    * extraction. No shuffle in the streaming plan — partition-local
    * kernel, so throughput scales with input partitioning.
    */
  def extractStream(spark: SparkSession, inputDir: String,
      cfg: ExtractConfig = ExtractConfig()): Dataset[ExtractedTurn] = {
    import spark.implicits._
    spark.readStream.schema(turnSchema).json(inputDir)
      .as[Turn]
      .mapPartitions(_.map(t => Extract.extractTurn(t, cfg)))
  }

  /** Watermarked tumbling-window aggregation over events — the
    * streaming twin of the batch `q_window_agg` query (same window
    * semantics, plus late-data eviction).
    */
  def windowedEventCounts(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** Streaming exact dedup — the continuous twin of
    * `Dedup.exactSurvivors`: `dropDuplicatesWithinWatermark` on the
    * content hash, so state for hashes older than the watermark is
    * actually EVICTED (a plain `dropDuplicates("text_hash")` keeps one
    * state entry per distinct hash forever — the event-time column
    * must participate for eviction; at 100 TB/day that is an OOM, not
    * "bounded state"). A duplicate arriving after the horizon is the
    * documented trade-off of every streaming dedup.
    */
  def dedupStream(df: DataFrame, textCol: String, tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    df.withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Streaming per-turn language id + quality flags over the extracted
    * stream — shuffle-free (row-local Columns on top of the kernel).
    */
  def langIdStream(extracted: Dataset[ExtractedTurn]): DataFrame =
    extracted.toDF().select(col("conv_id"), col("turn_idx"),
      graft.operators.TextStats.langId(col("extractedText")).as("lang_id"),
      length(col("extractedText")).as("n_chars"))

  /** Streaming ingest-quality gate over any streaming document frame:
    * the full Gopher rule verdict, PII redaction and BPE token count
    * as pure row-local Columns — the SAME kernels the batch
    * `q_quality_gopher` / `q_redact` queries oracle — so the
    * micro-batch plan carries NO state store and NO shuffle: the gate
    * runs at ingest wire speed and scales linearly with executors.
    */
  def qualityStream(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = graft.operators.TextStats.gopherCols(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      g.ok.as("gopher_ok"),
      graft.operators.TextStats.redactPii(col(textCol)).as("redacted"),
      graft.operators.TextStats.bpeTokenCount(col(textCol)).as("n_bpe_tokens"))
  }

  /** Parquet sink with checkpointing (exactly-once file sink). */
  def toParquetSink(ds: Dataset[ExtractedTurn], outDir: String,
      checkpointDir: String): DataStreamWriter[ExtractedTurn] =
    ds.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
}
