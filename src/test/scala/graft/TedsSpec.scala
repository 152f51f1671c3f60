package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Teds

class TedsSpec extends AnyFunSuite {
  private val t22 = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"

  test("identical tables → similarity 1.0, distance 0") {
    assert(Teds.similarity(t22, t22) == 1.0)
    assert(Teds.editDistance(Teds.fromTableHtml(t22), Teds.fromTableHtml(t22)) == 0)
  }

  test("single cell text change → distance 1 (relabel)") {
    val changed = t22.replace(">d<", ">x<")
    val d = Teds.editDistance(Teds.fromTableHtml(t22), Teds.fromTableHtml(changed))
    assert(d == 1)
    // tree size: table + 2 tr + 4 td + 4 words = 11
    assert(math.abs(Teds.similarity(t22, changed) - (1.0 - 1.0 / 11)) < 1e-12)
  }

  test("missing cell → distance = node + its word (2 deletions)") {
    val missing = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    val d = Teds.editDistance(Teds.fromTableHtml(t22), Teds.fromTableHtml(missing))
    assert(d == 2)
  }

  test("structure attrs matter: rowspan folds into the label") {
    val spanned = "<table><tr><td rowspan=2>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    val plain = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    assert(Teds.editDistance(Teds.fromTableHtml(spanned), Teds.fromTableHtml(plain)) == 1)
  }

  test("pipeline html of the template-4 table evaluates to 1.0 vs expected") {
    val t = graft.model.Turn("c", 0, "user",
      "<table><tr><td>lang</td><td>es</td></tr><tr><td>origin</td><td>src4</td></tr></table><p>x</p>",
      "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    val et = graft.pipeline.Extract.extractTurn(t)
    val expected = "<table><tr><td>lang</td><td>es</td></tr><tr><td>origin</td><td>src4</td></tr></table>"
    assert(Teds.similarity(et.tables.head.html, expected) == 1.0)
  }
}
