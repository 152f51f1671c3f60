package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Turn

/** Deterministic synthesis of the transcript input table
  * (`conv_id, turn_idx, role, text, tool, ts` — BASELINE.json
  * input_hint) from the driver-provided `documents` parquet.
  *
  * The synthesis is defined ONCE as ANSI SQL evaluated by BOTH engines:
  * Spark (to build the input Dataset) and DuckDB (inside every oracle
  * query as a CTE) — so the correctness gate verifies the whole
  * path generator → extraction → output against an independently
  * computed expectation. Templates wrap each document's text in
  * HTML chrome (nav/footer boilerplate, link sidebars, tables,
  * multi-column divs) whose known main content gives a closed-form
  * oracle for the extraction output.
  *
  * 40% of turns land in one giant conversation (`conv-big`) to
  * exercise the salted repartitioning required by the north rule.
  */
object Turns {

  /** Dialect-shared core: one row per document, extra passthrough
    * columns (doc_id, src_text, lang, source) retained for oracle
    * arithmetic. Works verbatim in Spark SQL and DuckDB.
    */
  val CoreSql: String = """
SELECT
  CASE WHEN doc_id % 5 < 2 THEN 'conv-big' ELSE concat('conv-', doc_id % 97) END AS conv_id,
  CAST(row_number() OVER (
    PARTITION BY (CASE WHEN doc_id % 5 < 2 THEN 'conv-big' ELSE concat('conv-', doc_id % 97) END)
    ORDER BY doc_id) - 1 AS INT) AS turn_idx,
  CASE doc_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'tool' ELSE 'system' END AS role,
  CASE doc_id % 7
    WHEN 0 THEN text
    WHEN 1 THEN concat('<html><head><title>Session Log</title></head><body><nav><a href="#">Home</a> <a href="#">Docs</a> <a href="#">About</a></nav><p>', text, '</p><footer><a href="#">Contact</a> imprint</footer></body></html>')
    WHEN 2 THEN concat('<div><p>', text, '</p><p>', text, '</p></div>')
    WHEN 3 THEN concat('<div class="sidebar"><a href="#">Link One</a> <a href="#">Link Two</a> <a href="#">Link Three</a></div><div class="main"><p>', text, '</p></div>')
    WHEN 4 THEN concat('<table><tr><td>lang</td><td>', lang, '</td></tr><tr><td>origin</td><td>', source, '</td></tr></table><p>', text, '</p>')
    WHEN 5 THEN concat('<h1>Report ', doc_id, '</h1><p>', text, '</p>')
    ELSE concat('<div style="left:0%;width:48%"><p>', text, '</p></div><div style="left:52%;width:48%;top:3%"><p>Column two of report ', doc_id, '</p></div>')
  END AS text,
  CASE WHEN doc_id % 4 = 2 THEN concat('{"name":"search","args":{"q":"', source, '"}}') ELSE '' END AS tool,
  doc_id, text AS src_text, lang, source
FROM documents
"""

  /** Oracle-side expected extracted text per template (must stay in
    * lock-step with the templates above and the segmenter semantics).
    */
  val ExpectedExtractedSql: String = """
  CASE doc_id % 7
    WHEN 2 THEN concat(src_text, chr(10), src_text)
    WHEN 5 THEN concat('Report ', doc_id, chr(10), src_text)
    WHEN 6 THEN concat(src_text, chr(10), 'Column two of report ', doc_id)
    ELSE src_text
  END
"""

  /** Words in a single-space-separated string. */
  val WcSql: String = "(length(src_text) - length(replace(src_text, ' ', '')) + 1)"

  /** Oracle-side word count of everything rendered (kept + chrome). */
  val ExpectedWordCountSql: String = s"""
  CAST($WcSql + CASE doc_id % 7
    WHEN 1 THEN 5 WHEN 2 THEN $WcSql WHEN 3 THEN 6 WHEN 4 THEN 4
    WHEN 5 THEN 2 WHEN 6 THEN 5 ELSE 0 END AS INT)
"""

  val ExpectedBlocksKeptSql: String =
    "CAST(CASE doc_id % 7 WHEN 2 THEN 2 WHEN 5 THEN 2 WHEN 6 THEN 2 ELSE 1 END AS INT)"

  val ExpectedBlocksDroppedSql: String =
    "CAST(CASE doc_id % 7 WHEN 1 THEN 2 WHEN 3 THEN 1 WHEN 4 THEN 4 ELSE 0 END AS INT)"

  /** Oracle CTE prelude: `WITH turns AS (...)`. */
  val TurnsCte: String = s"WITH turns AS ($CoreSql)"

  /** Spark-side synthesis: same SQL, documents registered as a temp
    * view; passthrough columns kept for tests, `ts` added (monotone
    * within a conversation).
    */
  def synthWithMeta(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")
    spark.sql(CoreSql)
      .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("doc_id")))
  }

  /** The input table proper (exact input_hint schema). */
  def synth(spark: SparkSession, sfDir: String): Dataset[Turn] = {
    import spark.implicits._
    synthWithMeta(spark, sfDir)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn]
  }
}
