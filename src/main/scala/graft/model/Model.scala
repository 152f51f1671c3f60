package graft.model

import java.sql.Timestamp

/** Core data model of the extraction engine.
  *
  * The unit of data is one conversation turn (the graft analogue of the
  * reference's `Image` datapoint, cf.
  * /root/reference/packages/dd_core/src/dd_core/datapoint/image.py:235):
  * a row of the input transcript table. The pipeline turns a [[Turn]]
  * into an [[ExtractedTurn]] carrying blocks + words with character
  * spans, reading order, and per-turn extraction metrics.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Character-offset span into the raw source payload (the transcript
  * analogue of the reference's `BoundingBox`,
  * dd_core/datapoint/box.py:215). `begin` inclusive, `end` exclusive.
  */
final case class Span(begin: Int, end: Int) {
  def length: Int = end - begin
  def contains(other: Span): Boolean = begin <= other.begin && other.end <= end
}

/** 2-D geometry attached to blocks/words by the deterministic renderer
  * so the reference's layout kernels (line grouping, column detection,
  * reading order) run on real coordinates. Mirrors
  * dd_core/datapoint/box.py:215 (`ulx,uly,lrx,lry,absolute_coords`).
  */
final case class BBox(ulx: Double, uly: Double, lrx: Double, lry: Double, absCoords: Boolean) {
  def width: Double = lrx - ulx
  def height: Double = lry - uly
  def cx: Double = (ulx + lrx) / 2.0
  def cy: Double = (uly + lry) / 2.0
  def area: Double = math.max(0.0, width) * math.max(0.0, height)
  /** box.py:563 `transform` — absolute→relative (divide by page dims). */
  def toRelative(pageW: Double, pageH: Double): BBox =
    if (!absCoords) this
    else BBox(ulx / pageW, uly / pageH, lrx / pageW, lry / pageH, absCoords = false)
  def toAbsolute(pageW: Double, pageH: Double): BBox =
    if (absCoords) this
    else BBox(ulx * pageW, uly * pageH, lrx * pageW, lry * pageH, absCoords = true)
}

/** One tokenized word (reference: word `ImageAnnotation` +
  * `ContainerAnnotation(CHARACTERS)`, dd_core/datapoint/annotation.py:716/:857).
  */
final case class Word(
    id: String,
    text: String,
    begin: Int,
    end: Int,
    box: BBox,
    blockId: String,   // parent block (filled by the matching kernel)
    readingOrder: Int, // 1-based position within its block (filled by order kernel)
    lineNo: Int,       // text line within the block
    tokenClass: String // LM token-class slot (reference lm.py:215-233 default OTHER)
)

/** One synthesized text line (reference `TextLineService`,
  * pipe/order.py:581 — LINE annotations with child word ids).
  */
final case class LineOut(
    id: String,
    blockId: String,
    begin: Int,
    end: Int,
    nWords: Int,
    /** USE_LINE_MATCHER relationship (factory.py:1787 →
      * MatchingService with FamilyCompound(parent=LIST, child=LINE),
      * :1135): the matched list-family parent block's id, "" when the
      * service is off or no parent clears the threshold.
      */
    listId: String = ""
)

/** One layout block (reference: layout `ImageAnnotation` with a
  * `reading_order` sub-category, deepdoctection/pipe/layout.py:68 +
  * pipe/order.py:630).
  */
final case class Block(
    id: String,
    kind: String,        // vocabulary in [[LayoutLabel]]
    begin: Int,
    end: Int,
    box: BBox,
    score: Double,
    readingOrder: Int,   // 1-based over kept floating blocks; -1 if none
    kept: Boolean,       // main-content classification verdict
    textDensity: Double, // words per rendered line (boilerpipe-style)
    linkDensity: Double, // anchor chars / total chars
    tagDepth: Int,
    text: String,        // assembled block text (words in reading order)
    /** LAYOUT_LINK relationship (factory.py:1784 USE_LAYOUT_LINK via
      * NeighbourMatcher, pipe/common.py:182): the nearest configured
      * parent block's id, "" when the service is off or no parent
      * exists.
      */
    linkedBlockId: String = ""
)

/** Per-turn extraction metrics (north rule: blocks kept/dropped, span
  * counts, parse failures).
  */
final case class TurnMetrics(
    blocksKept: Int,
    blocksDropped: Int,
    wordCount: Int,
    spanCount: Int,
    parseFailed: Boolean
)

/** One reconstructed table cell (reference `CellKey.ROW_NUMBER` /
  * `COLUMN_NUMBER` / spans sub-categories, segment.py:492-584).
  */
final case class TableCellOut(
    row: Int, col: Int, rowSpan: Int, colSpan: Int,
    text: String, begin: Int, end: Int,
    /** COLUMN_HEADER sub-category analogue (view.py:656): markup `<th>`
      * cells; feeds `kv_header_rows`-style header→value projections.
      */
    header: Boolean = false)

/** One reconstructed table (reference `Table` view with html/csv,
  * view.py:787-858).
  */
final case class TableData(
    id: String, begin: Int, end: Int, nRows: Int, nCols: Int,
    html: String, cells: Array[TableCellOut])

/** Pipeline output row: the reference's `Page` view flattened
  * (dd_core/datapoint/view.py:1038).
  */
final case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    turn_id: String, // uuid3(conv_id + turn_idx), cf. image.py:373 image_id
    role: String,
    ts: Timestamp,
    extractedText: String,
    toolText: String, // values extracted from the tool (JSON) payload
    lang: String, // LanguageDetectionService analogue (pipe/language.py:33)
    /** LMSequenceClassifierService slot (pipe/lm.py:289 — a page-level
      * category from a sequence classifier over the page text): filled
      * by `ExtractConfig.sequenceClassifier`, "" when the service is
      * off (the reference's config-off default).
      */
    docClass: String,
    blocks: Array[Block],
    words: Array[Word],
    lines: Array[LineOut],
    tables: Array[TableData],
    metrics: TurnMetrics
)

/** Chunk-level exploded output (reference `Page.chunks`, view.py:1409). */
final case class Chunk(
    conv_id: String,
    turn_id: String,
    turn_idx: Int,
    block_id: String,
    reading_order: Int,
    kind: String,
    text: String,
    span_begin: Int,
    span_end: Int
)

/** Open string vocabularies (reference `ObjectTypes` enums,
  * dd_core/utils/object_types.py:482 `LayoutLabel` etc.).
  */
object LayoutLabel {
  val TEXT = "text"
  val TITLE = "title"
  val LIST_ITEM = "list_item"
  val TABLE = "table"
  val CELL = "cell"
  val ROW = "row"
  val COLUMN = "column"
  val LINE = "line"
  val WORD = "word"
  val FIGURE = "figure"
  val NAV = "nav"
  val HEADER = "header"
  val FOOTER = "footer"
  val ASIDE = "aside"
  val CAPTION = "caption"
  val CODE = "code"
  val KEY_VALUE_AREA = "key_value_area"
  /** Default token class (reference lm.py:215-233 `OTHER`). */
  val TOKEN_OTHER = "other"
  /** Reference default floating text categories
    * (view.py:959-1013 `IMAGE_DEFAULTS`): these contribute to
    * `Page.text`; everything else is residual.
    */
  val FloatingText: Set[String] = Set(TEXT, TITLE, LIST_ITEM, KEY_VALUE_AREA, CODE)
  /** Chrome categories dropped by main-content classification. */
  val Chrome: Set[String] = Set(NAV, HEADER, FOOTER, ASIDE)
}

object Roles {
  val USER = "user"
  val ASSISTANT = "assistant"
  val TOOL = "tool"
  val SYSTEM = "system"
}
