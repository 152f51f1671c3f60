package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Table

class TableSpec extends AnyFunSuite {

  test("simple 2x2 grid with reference HTML format") {
    val s = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    val List(t) = Table.parseTables(s)
    assert(t.nRows == 2 && t.nCols == 2)
    assert(t.cells.map(c => (c.row, c.col, c.text)).toList ==
      List((1, 1, "a"), (1, 2, "b"), (2, 1, "c"), (2, 2, "d")))
    assert(t.html == s)
    assert(t.csv.map(_.toList).toList == List(List("a", "b"), List("c", "d")))
  }

  test("colspan/rowspan placement skips occupied slots (refine.py:293-316)") {
    val s = "<table><tr><td rowspan=2>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    val List(t) = Table.parseTables(s)
    // c must land at (2,2) because (2,1) is covered by a's rowspan
    assert(t.cells.map(c => (c.row, c.col, c.rowSpan, c.colSpan)).toList ==
      List((1, 1, 2, 1), (1, 2, 1, 1), (2, 2, 1, 1)))
    assert(t.html == "<table><tr><td rowspan=2>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
    // csv: spanning content at upper-left tile only (view.py:831-858)
    assert(t.csv.map(_.toList).toList == List(List("a", "b"), List("", "c")))
  }

  test("colspan emits attribute and missing cells render empty td") {
    val s = "<table><tr><td colspan=2>wide</td></tr><tr><td>x</td></tr></table>"
    val List(t) = Table.parseTables(s)
    assert(t.nCols == 2)
    assert(t.html ==
      "<table><tr><td colspan=2>wide</td></tr><tr><td>x</td><td></td></tr></table>")
  }

  test("nested table is its own result, content excluded from outer cell") {
    val s = "<table><tr><td>outer <table><tr><td>inner</td></tr></table></td></tr></table>"
    val ts = Table.parseTables(s)
    assert(ts.length == 2)
    val outer = ts.head
    val inner = ts(1)
    assert(outer.cells.head.text == "outer")
    assert(inner.cells.head.text == "inner")
  }

  test("cell spans index the raw payload") {
    val s = "<table><tr><td>alpha beta</td></tr></table>"
    val List(t) = Table.parseTables(s)
    val c = t.cells.head
    assert(s.substring(c.begin, c.end) == "alpha beta")
  }

  test("malformed: unclosed table, stray text, bad span attrs") {
    val t1 = Table.parseTables("<table><tr><td>a")
    assert(t1.length == 1 && t1.head.cells.head.text == "a")
    val t2 = Table.parseTables("""<table><tr><td rowspan=x colspan=-2>a</td></tr></table>""")
    assert(t2.head.cells.head.rowSpan == 1 && t2.head.cells.head.colSpan == 1)
    assert(Table.parseTables("no tables here").isEmpty)
  }

  test("th cells flagged as header, entities decoded") {
    val s = "<table><tr><th>Name &amp; Id</th></tr><tr><td>x</td></tr></table>"
    val List(t) = Table.parseTables(s)
    assert(t.cells.head.header && t.cells.head.text == "Name & Id")
  }

  test("kvHeaderRows: spanning header maps to the last covered cell; tall cells serve every covered row") {
    // | Region | Sales (colspan 2) |
    // | EMEA↓  | 10 | 20 |         EMEA has rowspan=2
    // | (cov)  | 30 | 40 |
    val s = "<table><tr><th>Region</th><th colspan=2>Sales</th></tr>" +
      "<tr><td rowspan=2>EMEA</td><td>10</td><td>20</td></tr>" +
      "<tr><td>30</td><td>40</td></tr></table>"
    val List(t) = Table.parseTables(s)
    val cells = t.cells.toSeq
    // row 2: Region ← EMEA; Sales header (cols 2-3) overwritten to the
    // LAST covered cell (reference dict semantics, view.py:720-726)
    assert(Table.kvHeaderRows(cells, 2) ==
      Seq((1, "Region", "EMEA"), (2, "Sales", "20")))
    // row 3: the rowspan=2 EMEA cell still covers it
    assert(Table.kvHeaderRows(cells, 3) ==
      Seq((1, "Region", "EMEA"), (2, "Sales", "40")))
    // the header row maps headers onto themselves (reference behavior:
    // header cells are row cells of row 1 too)
    assert(Table.kvHeaderRows(cells, 1) ==
      Seq((1, "Region", "Region"), (2, "Sales", "Sales")))
    // out-of-range row → empty, no error
    assert(Table.kvHeaderRows(cells, 9).isEmpty)
  }

  test("row-scope th cells are row headers, not column headers (view.py:644,661 split)") {
    // | Year | Sales |      ← header row (all th)
    // | th:2023 | 10 |      ← row-scope th in the body
    // | th:2024 | 20 |
    val s = "<table><tr><th>Year</th><th>Sales</th></tr>" +
      "<tr><th>2023</th><td>10</td></tr>" +
      "<tr><th>2024</th><td>20</td></tr></table>"
    val List(t) = Table.parseTables(s)
    val cells = t.cells.toSeq
    assert(Table.headerRowCount(cells) == 1)
    assert(Table.columnHeaderCells(cells).map(_.text) == Seq("Year", "Sales"))
    assert(Table.rowHeaderCells(cells).map(c => (c.row, c.text)) ==
      Seq((2, "2023"), (3, "2024")))
    // kvHeaderRows must key on COLUMN headers only — the body th maps
    // as a value under 'Year', not as a header key
    assert(Table.kvHeaderRows(cells, 2) ==
      Seq((1, "Year", "2023"), (2, "Sales", "10")))
  }

  test("crosstab with a blank td corner still yields its column headers") {
    val s = "<table><tr><td></td><th>2023</th><th>2024</th></tr>" +
      "<tr><th>Sales</th><td>1</td><td>2</td></tr></table>"
    val List(t) = Table.parseTables(s)
    val cells = t.cells.toSeq
    assert(Table.headerRowCount(cells) == 1)
    assert(Table.columnHeaderCells(cells).map(c => (c.col, c.text)) ==
      Seq((2, "2023"), (3, "2024")))
    assert(Table.kvHeaderRows(cells, 2) ==
      Seq((2, "2023", "1"), (3, "2024", "2")))
  }
}
