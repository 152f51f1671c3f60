package graft.kernels

import scala.collection.mutable

/** TEDS — Tree-Edit-Distance-based Similarity for table structures,
  * the reference's table-evaluation metric
  * (deepdoctection/eval/tedsmetric.py:110/:203/:235; published as
  * "Image-based table recognition: data, model, and evaluation",
  * Zhong et al. 2020). Tables are parsed into ordered labeled trees
  * (table → tr → td[rowspan,colspan] → word leaves) and compared with
  * the Zhang–Shasha ordered tree edit distance (unit costs);
  * similarity = 1 − distance / max(|T1|, |T2|).
  *
  * Pure Scala; O(n²m²) worst case is fine for per-row table sizes.
  */
object Teds {

  final case class TNode(label: String, children: Vector[TNode]) {
    // iterative: tree depth is attacker-controlled (nested <table>
    // tags), and a StackOverflowError is fatal to the Spark task —
    // no recursion anywhere in this kernel
    lazy val size: Int = {
      var c = 0
      val st = new java.util.ArrayDeque[TNode]
      st.push(this)
      while (!st.isEmpty) {
        val n = st.pop()
        c += 1
        n.children.foreach(st.push)
      }
      c
    }
  }

  /** Parse (the first) table in an HTML fragment into a tree; cell
    * attributes that affect structure (rowspan/colspan) fold into the
    * td label, cell text becomes word leaves (tedsmetric parses the
    * same shape from html strings).
    */
  def fromTableHtml(html: String): TNode = {
    val tables = parse(html)
    tables.headOption.getOrElse(TNode("table", Vector.empty))
  }

  private def parse(html: String): List[TNode] = {
    val events = Html.tokenize(html)
    final class B(val label: String) { val kids = mutable.ArrayBuffer.empty[TNode] }
    val stack = mutable.Stack.empty[B]
    val roots = mutable.ListBuffer.empty[TNode]
    def close(upTo: String): Unit = {
      while (stack.nonEmpty && stack.top.label.split("\\[").head != upTo) forcePop()
      if (stack.nonEmpty) forcePop()
    }
    def forcePop(): Unit = {
      val b = stack.pop()
      val node = TNode(b.label, b.kids.toVector)
      if (stack.nonEmpty) stack.top.kids += node
      else if (node.label == "table") roots += node
    }
    for (ev <- events) ev match {
      case Html.StartTag("table", _, _, _, false) => stack.push(new B("table"))
      case Html.StartTag("tr", _, _, _, _) if stack.nonEmpty => stack.push(new B("tr"))
      case Html.StartTag(n @ ("td" | "th"), attrs, _, _, _) if stack.nonEmpty =>
        val rs = attrs.getOrElse("rowspan", "1")
        val cs = attrs.getOrElse("colspan", "1")
        val suffix = if (rs != "1" || cs != "1") s"[$rs,$cs]" else ""
        stack.push(new B(n + suffix))
      case Html.EndTag(n @ ("td" | "th" | "tr" | "table"), _, _) if stack.nonEmpty =>
        close(n)
      case Html.Text(b, e, false) if stack.nonEmpty &&
          (stack.top.label.startsWith("td") || stack.top.label.startsWith("th")) =>
        for (w <- html.substring(b, e).trim.split("\\s+") if w.nonEmpty)
          stack.top.kids += TNode("#" + Html.decodeEntities(w), Vector.empty)
      case _ => ()
    }
    while (stack.nonEmpty) forcePop()
    roots.toList
  }

  /** Zhang–Shasha ordered tree edit distance with unit costs. */
  def editDistance(t1: TNode, t2: TNode): Int = {
    // postorder arrays + leftmost-leaf-descendant indices; explicit
    // stack (tree depth is input-controlled — see TNode.size)
    def flatten(root: TNode): (Array[String], Array[Int]) = {
      val labels = mutable.ArrayBuffer.empty[String]
      val lld = mutable.ArrayBuffer.empty[Int]
      final class Frame(val n: TNode) { var next = 0; var firstLeaf = -1 }
      val st = new java.util.ArrayDeque[Frame]
      st.push(new Frame(root))
      while (!st.isEmpty) {
        val f = st.peek()
        if (f.next < f.n.children.length) {
          f.next += 1
          st.push(new Frame(f.n.children(f.next - 1)))
        } else {
          st.pop()
          val firstLeaf = if (f.n.children.isEmpty) labels.length else f.firstLeaf
          labels += f.n.label
          lld += firstLeaf
          // the parent's leftmost leaf is its FIRST child's (-1 =
          // not yet set, so only the first completed child writes it)
          if (!st.isEmpty && st.peek().firstLeaf < 0)
            st.peek().firstLeaf = firstLeaf
        }
      }
      (labels.toArray, lld.toArray)
    }
    val (l1, lld1) = flatten(t1)
    val (l2, lld2) = flatten(t2)
    def keyroots(lld: Array[Int]): Array[Int] = {
      val seen = mutable.Set.empty[Int]
      val out = mutable.ArrayBuffer.empty[Int]
      for (i <- lld.indices.reverse) {
        if (!seen.contains(lld(i))) { out += i; seen += lld(i) }
      }
      out.toArray.sorted
    }
    val kr1 = keyroots(lld1)
    val kr2 = keyroots(lld2)
    val td = Array.ofDim[Int](l1.length, l2.length)

    def treedist(i: Int, j: Int): Unit = {
      val li = lld1(i); val lj = lld2(j)
      val m = i - li + 2; val n = j - lj + 2
      val fd = Array.ofDim[Int](m, n)
      for (x <- 1 until m) fd(x)(0) = fd(x - 1)(0) + 1
      for (y <- 1 until n) fd(0)(y) = fd(0)(y - 1) + 1
      for (x <- 1 until m; y <- 1 until n) {
        val di = li + x - 1; val dj = lj + y - 1
        if (lld1(di) == li && lld2(dj) == lj) {
          val rel = if (l1(di) == l2(dj)) 0 else 1
          fd(x)(y) = math.min(math.min(fd(x - 1)(y) + 1, fd(x)(y - 1) + 1), fd(x - 1)(y - 1) + rel)
          td(di)(dj) = fd(x)(y)
        } else {
          val xi = lld1(di) - li; val yj = lld2(dj) - lj
          fd(x)(y) = math.min(math.min(fd(x - 1)(y) + 1, fd(x)(y - 1) + 1),
            fd(xi)(yj) + td(di)(dj))
        }
      }
    }
    for (i <- kr1; j <- kr2) treedist(i, j)
    td(l1.length - 1)(l2.length - 1)
  }

  /** Zhang–Shasha needs an |T1|·|T2| Int matrix; above this many
    * cells (64 MB) a hostile pair of giant tables would OOM the
    * executor — degrade to 0.0 similarity instead (any real table
    * pair is orders of magnitude below this).
    */
  private val MaxDistanceCells = 16L * 1024 * 1024

  /** tedsmetric.py similarity: 1 − TED / max(|T1|, |T2|). */
  def similarity(htmlA: String, htmlB: String): Double = {
    val a = fromTableHtml(htmlA)
    val b = fromTableHtml(htmlB)
    val denom = math.max(a.size, b.size)
    if (denom == 0) 1.0
    else if (a.size.toLong * b.size > MaxDistanceCells) 0.0
    else 1.0 - editDistance(a, b).toDouble / denom
  }
}
