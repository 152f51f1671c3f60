package graft.kernels

import scala.collection.mutable

/** Table segmentation over markup — the transcript analogue of the
  * reference's `TableSegmentationService` + refinement + HTML/CSV
  * assembly (deepdoctection/pipe/segment.py:492-584 cell→row/col
  * numbering with spans; pipe/refine.py:271-348 HTML generation with
  * `rowspan=`/`colspan=` attributes and filled-position bookkeeping;
  * view.py:787-858 HTML resolution and CSV tiling with content at the
  * upper-left tile only).
  *
  * Where the reference infers the grid geometrically from detector
  * boxes (row_num = min matched row by weighted IoA, span = count of
  * matches), markup already carries the grid; the same outputs
  * (row/col numbers, spans, html, csv) are produced via the standard
  * HTML placement algorithm (cursor + occupancy from spans).
  * Row-local, pure, error-tolerant.
  */
object Table {

  final case class TableCell(
      row: Int, col: Int, rowSpan: Int, colSpan: Int,
      text: String, begin: Int, end: Int, header: Boolean)

  final case class TableResult(
      begin: Int, end: Int, nRows: Int, nCols: Int,
      cells: Array[TableCell], html: String, csv: Array[Array[String]])

  private final class CellB(val rowSpan: Int, val colSpan: Int, val header: Boolean) {
    val words = mutable.ListBuffer.empty[String]
    var begin: Int = -1
    var end: Int = -1
    def text: String = words.mkString(" ")
  }

  private final class TableB(val start: Int) {
    val rows = mutable.ListBuffer.empty[mutable.ListBuffer[CellB]]
    var cur: CellB = null
    def newRow(): Unit = { rows += mutable.ListBuffer.empty; cur = null }
    def newCell(rs: Int, cs: Int, header: Boolean): Unit = {
      if (rows.isEmpty) newRow()
      cur = new CellB(rs, cs, header)
      rows.last += cur
    }
  }

  /** Parse every `<table>` in the payload (nested tables become their
    * own results; their content does not leak into the enclosing
    * cell's text — the reference's sub-layout re-segmentation slot,
    * pipe/sub_layout.py:158).
    */
  def parseTables(payload: String): List[TableResult] = {
    val events = Html.tokenize(payload)
    val results = mutable.ListBuffer.empty[TableResult]
    val stack = mutable.Stack.empty[TableB]

    def intAttr(attrs: Map[String, String], name: String): Int =
      attrs.get(name).flatMap(v => scala.util.Try(v.trim.toInt).toOption)
        .filter(_ >= 1).getOrElse(1)

    for (ev <- events) ev match {
      case Html.StartTag("table", _, begin, _, false) =>
        stack.push(new TableB(begin))
      case Html.StartTag("tr", _, _, _, _) if stack.nonEmpty =>
        stack.top.newRow()
      case Html.StartTag(n @ ("td" | "th"), attrs, _, _, _) if stack.nonEmpty =>
        stack.top.newCell(intAttr(attrs, "rowspan"), intAttr(attrs, "colspan"), n == "th")
      case Html.EndTag("td" | "th", _, _) if stack.nonEmpty =>
        stack.top.cur = null
      case Html.EndTag("table", _, end) if stack.nonEmpty =>
        val tb = stack.pop()
        results += build(tb.start, end, tb.rows.map(_.toList).toList)
      case Html.Text(begin, end, raw) if stack.nonEmpty && !raw =>
        val cell = stack.top.cur
        if (cell != null) {
          var i = begin
          while (i < end) {
            while (i < end && payload.charAt(i).isWhitespace) i += 1
            if (i < end) {
              val ws = i
              while (i < end && !payload.charAt(i).isWhitespace) i += 1
              cell.words += Normalize.nfc(Html.decodeEntities(payload.substring(ws, i)))
              if (cell.begin < 0) cell.begin = ws
              cell.end = i
            }
          }
        }
      case _ => ()
    }
    while (stack.nonEmpty) { // unclosed at EOF: emit what was parsed
      val tb = stack.pop()
      results += build(tb.start, payload.length, tb.rows.map(_.toList).toList)
    }
    results.toList.sortBy(_.begin)
  }

  private def build(begin: Int, end: Int, rows: List[List[CellB]]): TableResult = {
    // standard placement: cursor per row, occupancy from row/col spans
    val occupied = mutable.Set.empty[(Int, Int)]
    val cells = mutable.ListBuffer.empty[TableCell]
    var nCols = 0
    for ((row, r0) <- rows.zipWithIndex) {
      val r = r0 + 1 // 1-based (reference CellKey.ROW_NUMBER)
      var c = 1
      for (cb <- row) {
        while (occupied.contains((r, c))) c += 1
        cells += TableCell(r, c, cb.rowSpan, cb.colSpan, cb.text, cb.begin, cb.end, cb.header)
        for (dr <- 0 until cb.rowSpan; dc <- 0 until cb.colSpan)
          occupied += ((r + dr, c + dc))
        c += cb.colSpan
      }
      nCols = math.max(nCols, c - 1)
    }
    val nRows = rows.length
    nCols = math.max(nCols, if (cells.isEmpty) 0 else cells.map(c => c.col + c.colSpan - 1).max)
    TableResult(begin, end, nRows, nCols, cells.toArray,
      htmlOf(nRows, nCols, cells.toList), csvOf(nRows, nCols, cells.toList))
  }

  /** refine.py:233-348 `_html_cell`/`_html_row`/`_html_table` format:
    * `<td rowspan=R colspan=C>` attributes only when ≠ 1; slots
    * covered by an earlier span are skipped; missing cells render as
    * bare `<td></td>`.
    */
  def htmlOf(nRows: Int, nCols: Int, cells: List[TableCell]): String = {
    val sb = new StringBuilder("<table>")
    val filled = mutable.Set.empty[(Int, Int)]
    for (r <- 1 to nRows) {
      sb.append("<tr>")
      val rowCells = cells.filter(_.row == r).sortBy(_.col)
      for (c <- 1 to nCols) {
        if (!filled.contains((r, c))) {
          rowCells.find(_.col == c) match {
            case Some(cell) =>
              sb.append("<td")
              if (cell.rowSpan != 1) sb.append(s" rowspan=${cell.rowSpan}")
              if (cell.colSpan != 1) sb.append(s" colspan=${cell.colSpan}")
              if (cell.rowSpan != 1 || cell.colSpan != 1)
                for (dr <- 0 until cell.rowSpan; dc <- 0 until cell.colSpan)
                  filled += ((r + dr, c + dc))
              sb.append(">").append(cell.text).append("</td>")
            case None =>
              sb.append("<td></td>")
          }
        }
      }
      sb.append("</tr>")
    }
    sb.append("</table>").toString
  }

  /** Number of LEADING rows made up entirely of header cells — the
    * markup analogue of the reference's COLUMN_HEADER sub-category
    * (its models mark header cells individually; in markup the column
    * headers are the `<th>`-only rows at the top, and a `<th>` further
    * down is a ROW header, e.g. `scope="row"`).
    */
  def headerRowCount(cells: Seq[TableCell]): Int = {
    val byRow = cells.groupBy(_.row)
    // a header row needs ≥1 <th> and no non-header CONTENT — a blank
    // <td> corner (crosstab layout) doesn't stop the header band
    def isHeaderRow(row: Seq[TableCell]) =
      row.exists(_.header) && row.forall(c => c.header || c.text.isEmpty)
    var r = 1
    while (byRow.get(r).exists(isHeaderRow)) r += 1
    r - 1
  }

  /** `column_header_cells` (view.py:644): header cells of the leading
    * header rows, sorted by column number.
    */
  def columnHeaderCells(cells: Seq[TableCell]): Seq[TableCell] = {
    val h = headerRowCount(cells)
    cells.filter(c => c.header && c.row <= h).sortBy(_.col)
  }

  /** `row_header_cells` (view.py:661): `<th>` cells BELOW the leading
    * header rows (row-scope headers), sorted by column number.
    */
  def rowHeaderCells(cells: Seq[TableCell]): Seq[TableCell] = {
    val h = headerRowCount(cells)
    cells.filter(c => c.header && c.row > h).sortBy(_.col)
  }

  /** `Table.kv_header_rows` (view.py:709-727): for one row number, map
    * each column header to the row's cell value under it. Row cells =
    * cells whose row span covers `rowNumber` (so a tall spanning cell
    * serves every row it covers), in column order; headers = the
    * COLUMN_HEADER cells (markup analogue: `<th>`), in column order; a
    * cell matches a header when its column falls inside the header's
    * column span. Reference overwrite semantics: later matching row
    * cells replace earlier values for the same header key.
    *
    * @return (headerCol, headerText, cellText) ordered by headerCol —
    *         the flattened form of the reference's
    *         `{(col, header): value}` dict.
    */
  def kvHeaderRows(cells: Seq[TableCell], rowNumber: Int): Seq[(Int, String, String)] = {
    val rowCells = cells
      .filter(c => c.row <= rowNumber && rowNumber <= c.row + c.rowSpan - 1)
      .sortBy(_.col)
    val headers = columnHeaderCells(cells)
    val kv = mutable.LinkedHashMap.empty[(Int, String), String]
    for (cell <- rowCells; h <- headers
         if h.col <= cell.col && cell.col <= h.col + h.colSpan - 1)
      kv.update((h.col, h.text), cell.text)
    kv.toSeq.map { case ((c, h), v) => (c, h, v) }.sortBy(_._1)
  }

  /** view.py:831-858 `csv`: content at the upper-left tile of a
    * spanning cell; covered tiles stay blank.
    */
  def csvOf(nRows: Int, nCols: Int, cells: List[TableCell]): Array[Array[String]] = {
    val grid = Array.fill(nRows, nCols)("")
    for (cell <- cells if cell.row >= 1 && cell.col >= 1 &&
         cell.row <= nRows && cell.col <= nCols)
      grid(cell.row - 1)(cell.col - 1) = cell.text
    grid
  }
}
