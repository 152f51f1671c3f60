package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kernels.{FamilyCompound, FamilyMatch, Pdf}
import graft.model.BBox
import graft.sources.Serializers

/** Round-2 source/dataset coverage: PDF page splitting, the
  * publaynet-style COCO dataset instance, and FamilyCompound
  * synthetic parents (VERDICT r1 "What's missing" 5-7).
  */
class PdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def minimalPdf(pages: Seq[String],
      rawContent: Option[String] = None): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    sb.append(s"2 0 obj << /Type /Pages /Kids [$kids] /Count ${pages.length} >> endobj\n")
    pages.zipWithIndex.foreach { case (txt, i) =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      sb.append(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R /Contents $contObj 0 R >> endobj\n")
      val stream = rawContent.getOrElse(s"BT /F1 12 Tf ($txt) Tj ET")
      sb.append(s"$contObj 0 obj << /Length ${stream.length} >> stream\n$stream\nendstream endobj\n")
    }
    sb.append("%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** The same document shape as [[minimalPdf]] but with every content
    * stream Flate-compressed (the real-world common case), built
    * binary-safe. `lengthOverride` swaps the direct /Length for an
    * indirect reference to exercise the endstream-scan fallback.
    */
  private def flatePdf(pages: Seq[String], filter: String = "/FlateDecode",
      lengthOverride: Option[String] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    put("%PDF-1.4\n")
    put("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    put(s"2 0 obj << /Type /Pages /Kids [$kids] /Count ${pages.length} >> endobj\n")
    pages.zipWithIndex.foreach { case (txt, i) =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      put(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R /Contents $contObj 0 R >> endobj\n")
      val data = deflate(s"BT /F1 12 Tf ($txt) Tj ET")
      val len = lengthOverride.getOrElse(data.length.toString)
      put(s"$contObj 0 obj << /Length $len /Filter $filter >> stream\n")
      out.write(data)
      put("\nendstream endobj\n")
    }
    put("%%EOF\n")
    out.toByteArray
  }

  test("FlateDecode content streams extract the same text as their uncompressed twin") {
    val texts = Seq("Hello page one", "Second page")
    val plain = Pdf.splitPages(minimalPdf(texts))
    val flate = Pdf.splitPages(flatePdf(texts))
    assert(flate.map(_.pageNo) == Seq(1, 2))
    assert(flate.map(_.text) == plain.map(_.text))
    assert(flate.forall(_.text.nonEmpty))
  }

  test("indirect /Length falls back to the endstream scan and still inflates") {
    // reference to an object that does not exist → fallback scan
    val pages = Pdf.splitPages(flatePdf(Seq("indirect length"),
      lengthOverride = Some("99 0 R")))
    assert(pages.map(_.text) == Seq("indirect length"))
  }

  test("indirect /Length resolves through an integer object and slices exactly") {
    // append the referenced length object so the pre-pass resolves it
    // (no endstream scan — the length governs the slice)
    val texts = Seq("resolved length")
    val data = deflate("BT /F1 12 Tf (resolved length) Tj ET")
    val base = flatePdf(texts, lengthOverride = Some("99 0 R"))
    val withObj = new java.io.ByteArrayOutputStream()
    withObj.write(base)
    withObj.write(s"99 0 obj ${data.length} endobj\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val pages = Pdf.splitPages(withObj.toByteArray)
    assert(pages.map(_.text) == Seq("resolved length"))
  }

  test("absurd /Length values degrade to the fallback scan, not an exception") {
    val pages = Pdf.splitPages(flatePdf(Seq("huge length"),
      lengthOverride = Some("99999999999999999999")))
    assert(pages.map(_.text) == Seq("huge length"))
  }

  test("unknown filters skip to empty text but keep the page split") {
    val pages = Pdf.splitPages(flatePdf(Seq("opaque"), filter = "/LZWDecode"))
    assert(pages.map(_.pageNo) == Seq(1))
    assert(pages.head.text == "")
  }

  test("a direct /Length shields binary payloads from faking object boundaries") {
    // raw stream whose BYTES contain 'endobj' and an object header —
    // honoring /Length must keep the scan from truncating/inventing
    // objects (deflate output is arbitrary binary, so this happens)
    val trap = "BT (x) Tj ET endobj 9 0 obj"
    val bytes = minimalPdf(Seq("first"), rawContent = None) // twin for count
    val trapped = minimalPdf(Seq("first", "second"), rawContent = Some(trap))
    assert(Pdf.splitPages(bytes).length == 1)
    val pages = Pdf.splitPages(trapped)
    assert(pages.length == 2, s"object scan invented/lost pages: $pages")
    assert(pages.map(_.text) == Seq("x", "x"))
  }

  test("splitPages: page count, order, and uncompressed text extraction") {
    val pages = Pdf.splitPages(minimalPdf(Seq("Hello page one", "Second page")))
    assert(pages.map(_.pageNo) == Seq(1, 2))
    assert(pages.map(_.text) == Seq("Hello page one", "Second page"))
  }

  test("PDF string escapes decode: parens, backslash, octal") {
    val pages = Pdf.splitPages(minimalPdf(Seq("""a \(b\) \\ \101""")))
    assert(pages.head.text == """a (b) \ A""")
  }

  test("hex strings inside TJ arrays decode instead of clearing pending text") {
    // [(A) <4A6F> (B)] TJ — the hex token must not parse as operators
    // (which would silently drop the '(A)' literal)
    val pages = Pdf.splitPages(minimalPdf(Seq("dummy"),
      rawContent = Some("BT [(A) <4A6F> (B)] TJ ET")))
    assert(pages.head.text == "A Jo B")
  }

  test("readPdfPages: binaryFile scan + flatMap split, one row per page") {
    val dir = Files.createTempDirectory("graft_pdf")
    Files.write(dir.resolve("a.pdf"), minimalPdf(Seq("alpha one", "alpha two")))
    Files.write(dir.resolve("b.pdf"), minimalPdf(Seq("bravo only")))
    // a real-world (compressed) PDF must yield non-empty text through
    // the full Spark path, not just the unit kernel
    Files.write(dir.resolve("c.pdf"), flatePdf(Seq("charlie flate")))
    Files.writeString(dir.resolve("skip.txt"), "not a pdf")
    val rows = Serializers.readPdfPages(spark, dir.toString)
      .orderBy("path", "page_no").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 1, 1))
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("alpha one", "alpha two", "bravo only", "charlie flate"))
  }
}

class FunsdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("funsd-format page loads to word rows with BIO tags and links") {
    val dir = Files.createTempDirectory("graft_funsd")
    Files.writeString(dir.resolve("page1.json"),
      """{"form": [
        {"id": 0, "label": "question", "box": [0,0,100,20],
         "words": [{"text": "Name", "box": [0,0,40,20]},
                   {"text": "of", "box": [45,0,60,20]},
                   {"text": "applicant:", "box": [65,0,100,20]}],
         "linking": [[0,1]]},
        {"id": 1, "label": "answer", "box": [110,0,200,20],
         "words": [{"text": "Jordan", "box": [110,0,160,20]}],
         "linking": [[0,1]]},
        {"id": 2, "label": "OTHER", "box": [0,30,50,50],
         "words": [{"text": "page", "box": [0,30,25,50]},
                   {"text": "1", "box": [30,30,40,50]}],
         "linking": []}
      ]}""")
    val rows = Serializers.readFunsd(spark, dir.toString)
      .orderBy("entity_id", "word_idx").collect()
    assert(rows.length == 6)
    val tags = rows.map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("text"),
      r.getAs[String]("token_class"), r.getAs[String]("tag"), r.getAs[String]("token_tag")))
    assert(tags.toSeq == Seq(
      (0L, "Name", "question", "B", "B-question"),
      (0L, "of", "question", "I", "I-question"),
      (0L, "applicant:", "question", "I", "I-question"),
      (1L, "Jordan", "answer", "B", "B-answer"),
      (2L, "page", "other", "O", "O"),
      (2L, "1", "other", "O", "O")))
    // linking pairs resolve to partner entity ids on every word row
    assert(rows(0).getAs[scala.collection.Seq[Long]]("linked_entity_ids") == Seq(1L))
    assert(rows(3).getAs[scala.collection.Seq[Long]]("linked_entity_ids") == Seq(0L))
    assert(rows(4).getAs[scala.collection.Seq[Long]]("linked_entity_ids") == Seq())
    assert(rows.forall(_.getAs[String]("file_name") == "page1.json"))
  }

  test("xfund envelope: multi-record jsonl keeps EVERY record (multiLine=false)") {
    val dir = Files.createTempDirectory("graft_xfund")
    def rec(uid: String, fname: String, label: String, word: String) =
      s"""{"uid": "$uid", "lang": "de", "img": {"fname": "$fname", "width": 800, "height": 1000},
          "document": [
            {"id": 7, "label": "$label", "box": [0,0,300,40],
             "words": [{"text": "$word", "box": [0,0,100,40]}],
             "linking": []}]}""".replaceAll("\n\\s*", " ")
    // two records in ONE file: multiLine=true would silently keep only
    // the first — the xfund registry entry must not lose page 2
    Files.writeString(dir.resolve("de.jsonl"),
      rec("u1", "de_form_1.jpg", "header", "Antrag") + "\n" +
        rec("u2", "de_form_2.jpg", "question", "Name") + "\n")
    val rows = Serializers.instanceRegistry("xfund")(spark, dir.toString)
      .orderBy("file_name").collect()
    assert(rows.length == 2, "second jsonl record must not be dropped")
    val r = rows.head
    assert(r.getAs[String]("file_name") == "de_form_1.jpg")
    assert(r.getAs[String]("lang") == "de")
    assert(r.getAs[String]("token_class") == "header")
    assert(r.getAs[String]("token_tag") == "B-header")
    assert(rows(1).getAs[String]("token_tag") == "B-question")
    // registry wiring
    assert(Serializers.instanceRegistry.contains("funsd") &&
      Serializers.instanceRegistry.contains("xfund"))
  }
}

class InstanceLoadersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rvl-cdip: tabsep lines resolve to document-type rows (label+1 ids)") {
    val dir = Files.createTempDirectory("graft_rvl")
    Files.writeString(dir.resolve("val.txt"),
      "imagesa/0000123.tif 0\nimagesb/0000456.tif 15\n")
    val rows = Serializers.readRvlcdip(spark, dir.toString)
      .orderBy("file_name").collect()
    assert(rows.length == 2)
    assert(rows.map(r => (r.getAs[String]("file_name"), r.getAs[Int]("category_id"),
      r.getAs[String]("document_type"))).toSeq ==
      Seq(("0000123.tif", 1, "letter"), ("0000456.tif", 16, "memo")))
  }

  test("prodigy export: accept-filter, filename fallback, corner-point boxes") {
    val dir = Files.createTempDirectory("graft_prodigy")
    Files.writeString(dir.resolve("ann.jsonl"),
      """{"answer":"accept","meta":{"file":"p1.png"},"width":100.0,"height":80.0,"spans":[{"label":"title","id":"s1","points":[[10,5],[60,5],[60,25],[10,25]]},{"label":"text","id":"s2","points":[[-4,30],[90,30],[90,200],[-4,200]]}]}""" + "\n" +
      """{"answer":"reject","meta":{"file":"p2.png"},"spans":[{"label":"text","id":"s3","points":[[0,0],[1,0],[1,1],[0,1]]}]}""" + "\n")
    val rows = Serializers.readProdigy(spark, dir.toString)
      .orderBy("span_id").collect()
    assert(rows.length == 2, "rejected task must be filtered")
    val s1 = rows(0)
    assert(s1.getAs[String]("file_name") == "p1.png" && s1.getAs[String]("label") == "title")
    assert((s1.getAs[Double]("ulx"), s1.getAs[Double]("uly"),
      s1.getAs[Double]("lrx"), s1.getAs[Double]("lry")) == ((10.0, 5.0, 60.0, 25.0)))
    // out-of-image points clamp like prodigystruct.py:110-113
    val s2 = rows(1)
    assert((s2.getAs[Double]("ulx"), s2.getAs[Double]("lry")) == ((0.0, 80.0)))
  }

  test("pascal-voc xml: one row per object, pubtables1m name normalization") {
    val dir = Files.createTempDirectory("graft_voc")
    Files.writeString(dir.resolve("t1.xml"),
      """<?xml version="1.0"?>
        <annotation>
          <filename>t1.jpg</filename>
          <size><width>800</width><height>600</height></size>
          <object><name>table</name>
            <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>700</xmax><ymax>500</ymax></bndbox></object>
          <object><name>table spanning cell</name>
            <bndbox><xmin>30</xmin><ymin>40</ymin><xmax>120</xmax><ymax>90</ymax></bndbox></object>
        </annotation>""")
    val rows = Serializers.readPascalVoc(spark, dir.toString,
        Serializers.Pubtables1mNameMapping)
      .orderBy("ulx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("label")).toSeq == Seq("table", "spanning_cell"))
    assert(rows(0).getAs[Double]("lrx") == 700.0 && rows(0).getAs[Double]("width") == 800.0)
    // iiitar13k flavor: no mapping, raw names pass through
    assert(Serializers.readPascalVoc(spark, dir.toString)
      .filter(col("label") === "table spanning cell").count() == 1)
  }

  test("fintabnet jsonl: pubtabnet-style html reassembly + bbox/table_id passthrough") {
    val dir = Files.createTempDirectory("graft_fintab")
    Files.writeString(dir.resolve("f.jsonl"),
      """{"filename":"a.pdf","table_id":7,"split":"train","bbox":[10.0,20.0,200.0,120.0],""" +
        """"html":{"structure":{"tokens":["<tr>","<td>","</td>","<td>","</td>","</tr>"]},""" +
        """"cells":[{"tokens":["X"]},{"tokens":["Y"]}]}}""" + "\n")
    val r = Serializers.finTabNetDataset(spark, dir.toString).head()
    assert(r.getAs[String]("html") == "<table><tr><td>X</td><td>Y</td></tr></table>")
    assert(r.getAs[Long]("table_id") == 7L)
    assert(r.getAs[scala.collection.Seq[Double]]("bbox") == Seq(10.0, 20.0, 200.0, 120.0))
    // all five round-3 instances are registry-wired (11/11 total)
    for (n <- Seq("rvl-cdip", "layouttest", "iiitar13k", "pubtables1m", "fintabnet"))
      assert(Serializers.instanceRegistry.contains(n), n)
  }
}

class CocoDatasetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("publaynet-style builder: images pre-joined with label-mapped annotations") {
    val path = getClass.getResource("/coco_publaynet_fixture.json").getPath
    val ds = Serializers.cocoDataset(spark, path)
    val byId = ds.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_anns")).toMap
    assert(byId == Map(1L -> 2L, 2L -> 3L, 3L -> 0L))
    val img1 = ds.filter(col("id") === 1)
      .select(element_at(col("anns"), 1).getField("category")).head().getString(0)
    assert(img1 == "text") // ann 10, category_id 1
    // wired through the instance registry
    val viaRegistry = Serializers.instanceRegistry("publaynet")(spark, path)
    assert(viaRegistry.count() == 3)
  }
}

class FamilyMatchSpec extends AnyFunSuite {

  test("FamilyCompound: kind filtering + per-orphan synthetic parents") {
    val parents = IndexedSeq(
      ("table", BBox(0, 0, 100, 100, absCoords = true)),
      ("figure", BBox(200, 200, 300, 300, absCoords = true)))
    val children = IndexedSeq(
      ("cell", BBox(10, 10, 20, 20, absCoords = true)),    // inside table
      ("cell", BBox(210, 210, 220, 220, absCoords = true)), // inside figure (excluded kind)
      ("cell", BBox(500, 500, 510, 510, absCoords = true)), // orphan
      ("word", BBox(15, 15, 18, 18, absCoords = true)))     // excluded child kind
    val fc = FamilyCompound(parentKinds = Set("table"), childKinds = Set("cell"),
      createSyntheticParent = true, syntheticParent = "line")
    val (pairs, synth) = FamilyMatch.matchFamily(parents, children, fc)
    assert(pairs == Seq((0, 0))) // only cell-0 inside the table parent
    // children 1 and 2 are unmatched cells → one synthetic parent EACH,
    // carrying the child's own box (pipe/common.py:314-339)
    assert(synth.map(_.childIdx) == Seq(1, 2))
    assert(synth.forall(_.kind == "line"))
    assert(synth.head.box == children(1)._2)
  }

  test("empty kind sets mean all kinds (reference None semantics)") {
    val parents = IndexedSeq(("block", BBox(0, 0, 50, 50, absCoords = true)))
    val children = IndexedSeq(("w", BBox(1, 1, 2, 2, absCoords = true)))
    val (pairs, synth) = FamilyMatch.matchFamily(parents, children, FamilyCompound())
    assert(pairs == Seq((0, 0)) && synth.isEmpty)
  }
}

class RemoveBackfillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.pipeline.{Extract, ExtractConfig}

  test("removeAnnotations drops a block in place and recomputes text/order/metrics") {
    val turns = graft.sources.Turns.synth(spark, TestSpark.sfDir).limit(200).collect()
    // pick a turn with >= 2 kept blocks so removal visibly changes text
    val et = turns.map(t => Extract.extractTurn(t))
      .find(_.blocks.count(_.kept) >= 2).get
    val victim = et.blocks.filter(_.kept).minBy(_.readingOrder)
    val after = Extract.removeAnnotations(et, Set(victim.id))
    assert(!after.blocks.exists(_.id == victim.id))
    assert(after.metrics.blocksKept == et.metrics.blocksKept - 1)
    // reading order compacted from 1 with relative order preserved
    val orders = after.blocks.filter(_.kept).map(_.readingOrder).sorted
    assert(orders.toList == (1 to orders.length).toList)
    // text no longer contains the removed block's text segment
    assert(after.extractedText ==
      et.blocks.filter(b => b.kept && b.id != victim.id)
        .sortBy(_.readingOrder).map(_.text).mkString("\n"))
    // words of the removed block are detached, not silently dropped
    val detached = after.words.filter(w => et.words.exists(ew =>
      ew.id == w.id && ew.blockId == victim.id))
    assert(detached.nonEmpty && detached.forall(w => w.blockId == "" && w.readingOrder == -1))
    // removing nothing is identity
    assert(Extract.removeAnnotations(et, Set("nope")).extractedText == et.extractedText)
  }

  test("backfillKinds emits a whole-page placeholder for missing kinds") {
    val t = graft.model.Turn("c", 0, "user", "plain text only", "",
      new java.sql.Timestamp(0L))
    val et = Extract.extractTurn(t, ExtractConfig(backfillKinds = Seq("figure")))
    val fig = et.blocks.filter(_.kind == "figure")
    assert(fig.length == 1)
    assert(fig.head.box.ulx == 0 && fig.head.box.uly == 0)
    // present kinds are NOT duplicated
    val et2 = Extract.extractTurn(t, ExtractConfig(backfillKinds = Seq("text")))
    assert(et2.blocks.count(_.kind == "text") ==
      Extract.extractTurn(t).blocks.count(_.kind == "text"))
  }
}

class DoclaynetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("doclaynet instance: 11-category map + publaynet coarse relabel") {
    val path = getClass.getResource("/coco_publaynet_fixture.json").getPath
    val ds = Serializers.instanceRegistry("doclaynet")(spark, path)
    // fixture category_ids 1,2,4,5,3 → doclaynet caption/footnote/list/
    // page_footer/formula; publaynet coarse: text/text/list/text/text
    val img1 = ds.filter(col("id") === 1)
      .select(element_at(col("anns"), 1).getField("category"),
        element_at(col("anns"), 1).getField("publaynet_cat")).head()
    assert(img1.getString(0) == "caption" && img1.getString(1) == "text")
    val img2 = ds.filter(col("id") === 2)
      .select(element_at(col("anns"), 2).getField("category"),
        element_at(col("anns"), 2).getField("publaynet_cat")).head()
    assert(img2.getString(0) == "page_footer" && img2.getString(1) == "text")
  }
}

class PubTabNetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pubtabnet jsonl -> reconstructed table html -> TEDS") {
    val dir = Files.createTempDirectory("graft_ptn")
    val line1 = """{"filename":"t1.png","split":"val","html":{"structure":{"tokens":["<thead>","<tr>","<td>","</td>","<td>","</td>","</tr>","</thead>","<tbody>","<tr>","<td>","</td>","<td"," colspan=\"2\"",">","</td>","</tr>","</tbody>"]},"cells":[{"tokens":["H","1"]},{"tokens":["H2"]},{"tokens":["a"]},{"tokens":["b"]}]}}"""
    Files.writeString(dir.resolve("val.jsonl"), line1 + "\n")
    val ds = Serializers.pubTabNetDataset(spark, dir.toString)
    val html = ds.head().getString(2)
    assert(html ==
      "<table><thead><tr><td>H1</td><td>H2</td></tr></thead>" +
      """<tbody><tr><td>a</td><td colspan="2">b</td></tr></tbody></table>""")
    // feeds TEDS directly: identity similarity 1.0, a perturbed copy < 1.0
    assert(graft.kernels.Teds.similarity(html, html) == 1.0)
    val other = html.replace("H1", "DIFFERENT").replace("<td>a</td>", "")
    assert(graft.kernels.Teds.similarity(html, other) < 1.0)
    // registry wiring
    assert(Serializers.instanceRegistry("pubtabnet")(spark, dir.toString).count() == 1)
  }
}

class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // AQE wraps the executed plan in AdaptiveSparkPlanExec, which
    // plan.collect does NOT descend into — inspect the final plan's
    // string form after execution instead
    def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
      df.count()
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    }
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS docs_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS docs_bucketed_b")
    // a stale warehouse dir from a killed session blocks CREATE even
    // after DROP (the catalog forgot the table, the location remains)
    val wh = java.nio.file.Paths.get(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    for (t <- Seq("docs_bucketed_a", "docs_bucketed_b")) {
      val dir = wh.resolve(t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("docs_bucketed_a")
    docs.select(col("doc_id"), col("lang")).write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("docs_bucketed_b")
    val joined = spark.table("docs_bucketed_a")
      .join(spark.table("docs_bucketed_b"), "doc_id")
    assert(joined.count() == docs.count())
    assert(shuffleCount(joined) == 0, "bucketed join must be shuffle-free")
    // contrast: the same sort-merge join over plain parquet DOES
    // shuffle (merge hint — AQE would otherwise broadcast the tiny side)
    val plain = docs.hint("merge")
      .join(docs.select(col("doc_id"), col("lang")).hint("merge"), "doc_id")
    assert(shuffleCount(plain) > 0)
    spark.sql("DROP TABLE IF EXISTS docs_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS docs_bucketed_b")
  }
}

class PdfTjArraySpec extends AnyFunSuite {
  import graft.kernels.Pdf

  test("multi-string TJ arrays keep every string (kerned-text form)") {
    assert(Pdf.extractText("BT [(Hel) 10 (lo) -20 (world)] TJ ET") == "Hel lo world")
    assert(Pdf.extractText("BT /F1 12 Tf (A) Tj (B) Tj ET") == "A B")
    // quote operators show too; non-show operators consume operands
    assert(Pdf.extractText("BT (moved) ' ET") == "moved")
    assert(Pdf.extractText("BT (discarded) Td (kept) Tj ET") == "kept")
  }
}
