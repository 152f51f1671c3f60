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
  * Twelve templates (doc_id % 12). 0–6 are the round-1 shapes;
  * 7–11 are adversarial layouts that drive the hard kernels through
  * the DRIVER oracle, not just specs (VERDICT r2 top item):
  *  - 7: full-width banner over three placed columns — exercises
  *    `Order.orderBlocks` column detection + `_connected_components`
  *    (the three columns vertically chain into one component, the
  *    banner stays its own; reference pipe/order.py:164-199).
  *  - 8: a tall narrow block, an inset block whose own column ends up
  *    ≥90% inside the final merged column, and a two-block chain —
  *    exercises `_consolidate_columns` (order.py:332-349): the inset
  *    is re-parented and reads in y-order inside the big column, NOT
  *    as a trailing separate column.
  *  - 9: two byte-identical absolutely-placed overlays (IoU = 1.0) —
  *    exercises AnnotationNmsService for real (greedy NMS must drop
  *    the second), plus a normal-flow paragraph that renders ABOVE
  *    the overlay so reading order is geometric, not document order.
  *  - 10: combining-character text (e + U+0301) — exercises the NFC
  *    word normalization with raw-offset spans (span width ≠ NFC text
  *    length).
  *  - 11: a nested table (table inside a cell) + a trailing paragraph
  *    — exercises the nested `Table.parseTables` path and cell-block
  *    drop accounting under the driver oracle.
  *
  * The template literals are Scala vals interpolated into [[CoreSql]],
  * so the x2_chunks span constants in SparkEntry derive from the SAME
  * strings (`indexOf`/`length`) — lock-step by construction, not by
  * hand-maintained arithmetic.
  *
  * 40% of turns land in one giant conversation (`conv-big`) to
  * exercise the salted repartitioning required by the north rule.
  */
object Turns {

  // ---- template literals (single source of truth for payload AND
  // oracle span constants) ----

  /** tpl 7: banner + three columns whose y-ranges overlap pairwise
    * (20/21/22%) so `_connected_components` chains them into one
    * component; the banner (top:0%) stays a separate component.
    */
  val T7: String =
    """<div style="left:0%;width:100%;top:0%"><p>Banner head</p></div>""" +
      """<div style="left:0%;width:30%;top:20%"><p>alpha one</p></div>""" +
      """<div style="left:34%;width:30%;top:21%"><p>beta two</p></div>""" +
      """<div style="left:68%;width:30%;top:22%"><p>gamma three</p></div>"""

  /** tpl 8: width:4% forces one word per line (8 lines, y 100–260);
    * the inset at (5%,18%) fails every x-join rule against the narrow
    * column, forms its own column, and is consolidated away once the
    * chain rows (28%, 32%) have grown the first column over it.
    */
  val T8: String =
    """<div style="left:0%;width:4%;top:10%"><p>north south ridge creek stone maple cedar birch</p></div>""" +
      """<div style="left:5%;width:20%;top:18%"><p>inset xy</p></div>""" +
      """<div style="left:0%;width:30%;top:28%"><p>first chain row</p></div>""" +
      """<div style="left:0%;width:30%;top:32%"><p>second chain row</p></div>"""

  /** tpl 9: the two overlays render at identical coordinates (same
    * left/top, width differs only as a Place key so they do NOT share
    * a flow cursor) — IoU 1.0, greedy NMS keeps the first. The
    * normal-flow paragraph renders at y=10, above the overlays at
    * y=50, so it must order FIRST despite coming first in the doc
    * too; swap-resistance comes from the overlay pair itself.
    */
  val T9: String =
    """<p>after overlay</p>""" +
      """<div style="left:0%;width:50%;top:5%"><p>duplicate overlay block</p></div>""" +
      """<div style="left:0%;width:51%;top:5%"><p>duplicate overlay block</p></div>"""

  /** tpl 10 prefix: decomposed e + COMBINING ACUTE (U+0301) in the
    * payload; the segmenter NFC-normalizes word text, so the chunk
    * text is the precomposed form while spans index the RAW payload
    * (5 raw chars for "Café").
    */
  val T10Prefix: String = "<p>Cafe\u0301 resume\u0301 touche\u0301</p><p>"
  /** Raw combining-sequence length of the three words (21 vs 18 NFC). */
  val T10RawLen: Int = T10Prefix.length - "<p></p><p>".length
  /** The NFC text the pipeline must emit for the first block. */
  val T10Nfc: String = "Caf\u00e9 resum\u00e9 touch\u00e9"

  /** tpl 11 prefix: nested table (inner table inside the second cell
    * of the outer), then the document text as the only kept block.
    */
  val T11Prefix: String =
    "<table><tr><td>outer a</td><td><table><tr><td>x1</td><td>y1</td></tr></table></td></tr></table><p>"
  val T11OuterHtml: String = "<table><tr><td>outer a</td><td></td></tr></table>"
  val T11InnerHtml: String = "<table><tr><td>x1</td><td>y1</td></tr></table>"

  /** Dialect-shared core: one row per document, extra passthrough
    * columns (doc_id, src_text, lang, source) retained for oracle
    * arithmetic. Works verbatim in Spark SQL and DuckDB.
    */
  val CoreSql: String = s"""
SELECT
  CASE WHEN doc_id % 5 < 2 THEN 'conv-big' ELSE concat('conv-', doc_id % 97) END AS conv_id,
  CAST(row_number() OVER (
    PARTITION BY (CASE WHEN doc_id % 5 < 2 THEN 'conv-big' ELSE concat('conv-', doc_id % 97) END)
    ORDER BY doc_id) - 1 AS INT) AS turn_idx,
  CASE doc_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'tool' ELSE 'system' END AS role,
  CASE doc_id % 12
    WHEN 0 THEN text
    WHEN 1 THEN concat('<html><head><title>Session Log</title></head><body><nav><a href="#">Home</a> <a href="#">Docs</a> <a href="#">About</a></nav><p>', text, '</p><footer><a href="#">Contact</a> imprint</footer></body></html>')
    WHEN 2 THEN concat('<div><p>', text, '</p><p>', text, '</p></div>')
    WHEN 3 THEN concat('<div class="sidebar"><a href="#">Link One</a> <a href="#">Link Two</a> <a href="#">Link Three</a></div><div class="main"><p>', text, '</p></div>')
    WHEN 4 THEN concat('<table><tr><td>lang</td><td>', lang, '</td></tr><tr><td>origin</td><td>', source, '</td></tr></table><p>', text, '</p>')
    WHEN 5 THEN concat('<h1>Report ', doc_id, '</h1><p>', text, '</p>')
    WHEN 6 THEN concat('<div style="left:0%;width:48%"><p>', text, '</p></div><div style="left:52%;width:48%;top:3%"><p>Column two of report ', doc_id, '</p></div>')
    WHEN 7 THEN '$T7'
    WHEN 8 THEN '$T8'
    WHEN 9 THEN '$T9'
    WHEN 10 THEN concat('$T10Prefix', text, '</p>')
    ELSE concat('$T11Prefix', text, '</p>')
  END AS text,
  CASE WHEN doc_id % 4 = 2 THEN concat('{"name":"search","args":{"q":"', source, '"}}') ELSE '' END AS tool,
  doc_id, text AS src_text, lang, source
FROM documents
"""

  /** Oracle-side expected extracted text per template (must stay in
    * lock-step with the templates above and the segmenter semantics).
    * Dialect-shared (SparkSpec evaluates it with Spark `expr`).
    */
  val ExpectedExtractedSql: String = s"""
  CASE doc_id % 12
    WHEN 2 THEN concat(src_text, chr(10), src_text)
    WHEN 5 THEN concat('Report ', doc_id, chr(10), src_text)
    WHEN 6 THEN concat(src_text, chr(10), 'Column two of report ', doc_id)
    WHEN 7 THEN concat('Banner head', chr(10), 'alpha one', chr(10), 'beta two', chr(10), 'gamma three')
    WHEN 8 THEN concat('north south ridge creek stone maple cedar birch', chr(10), 'inset xy', chr(10), 'first chain row', chr(10), 'second chain row')
    WHEN 9 THEN concat('after overlay', chr(10), 'duplicate overlay block')
    WHEN 10 THEN concat('$T10Nfc', chr(10), src_text)
    ELSE src_text
  END
"""

  /** Words in a single-space-separated string. */
  val WcSql: String = "(length(src_text) - length(replace(src_text, ' ', '')) + 1)"

  /** Oracle-side word count of everything rendered (kept + chrome).
    * Templates 7–9 are fully synthetic (no src words); 9 counts only
    * the SURVIVING overlay's 3 words — NMS drops the duplicate's words
    * before they are counted.
    */
  val ExpectedWordCountSql: String = s"""
  CAST(CASE doc_id % 12
    WHEN 7 THEN 8 WHEN 8 THEN 16 WHEN 9 THEN 5
    WHEN 1 THEN $WcSql + 5 WHEN 2 THEN $WcSql + $WcSql WHEN 3 THEN $WcSql + 6
    WHEN 4 THEN $WcSql + 4 WHEN 5 THEN $WcSql + 2 WHEN 6 THEN $WcSql + 5
    WHEN 10 THEN $WcSql + 3 WHEN 11 THEN $WcSql + 4
    ELSE $WcSql END AS INT)
"""

  val ExpectedBlocksKeptSql: String =
    """CAST(CASE doc_id % 12 WHEN 2 THEN 2 WHEN 5 THEN 2 WHEN 6 THEN 2
       WHEN 7 THEN 4 WHEN 8 THEN 4 WHEN 9 THEN 2 WHEN 10 THEN 2
       ELSE 1 END AS INT)"""

  val ExpectedBlocksDroppedSql: String =
    """CAST(CASE doc_id % 12 WHEN 1 THEN 2 WHEN 3 THEN 1 WHEN 4 THEN 4
       WHEN 11 THEN 3 ELSE 0 END AS INT)"""

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
