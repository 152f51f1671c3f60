package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, GraftExtensions}

class Uuid3ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Column API: codegen'd expression matches Python uuid3 vectors") {
    import spark.implicits._
    val df = Seq("", "a", "hello world", "conv-42#7").toDF("s")
    val out = df.select(GraftFunctions.uuid3(col("s"))).collect().map(_.getString(0))
    assert(out.toList == List(
      "c87ee674-4ddc-3efe-a74e-dfe25da5d7b3",
      "4c104dd0-4821-30d5-9ce3-0e7a1f8b7c0d",
      "11f3c98e-ee6f-32d6-93cc-8ea97b77b2a0",
      "531fa70b-a889-3476-ba36-ee8adb858806"))
  }

  test("null propagates, stays inside WholeStageCodegen") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
    val out = df.select(GraftFunctions.uuid3(col("s"))).collect()
    assert(out(0).getString(0) == graft.model.Ids.uuid3("x"))
    assert(out(1).isNullAt(0))
    // LocalTableScan skips codegen; use a Range-backed plan
    val plan = spark.range(3)
      .select(GraftFunctions.uuid3(concat(lit("r"), col("id"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project [graft_uuid3"))
  }

  test("SQL registration via SparkSessionExtensions") {
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // new session over the SAME SparkContext, with extensions applied;
    // never stop it (that would stop the shared context)
    val s2 = SparkSession.builder()
      .master("local[4]").appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql("SELECT graft_uuid3('hello world') AS u").collect().head.getString(0)
      assert(r == "11f3c98e-ee6f-32d6-93cc-8ea97b77b2a0")
    } finally {
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }
}

class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.operators.Eval

  test("accuracy / confusion / PRF on a hand-built pair") {
    import spark.implicits._
    val gold = Seq((1, "en"), (2, "de"), (3, "en"), (4, "fr")).toDF("id", "v")
    val pred = Seq((1, "en"), (2, "en"), (3, "en"), (4, "de")).toDF("id", "v")
    val acc = Eval.accuracy(pred, gold, Seq("id"), "v").collect().head
    assert(acc.getLong(0) == 4 && acc.getLong(1) == 2 && acc.getDouble(2) == 0.5)
    val conf = Eval.confusion(pred, gold, Seq("id"), "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(conf == Set(("en", "en", 2L), ("de", "en", 1L), ("fr", "de", 1L)))
    val prf = Eval.precisionRecallF1(pred, gold, Seq("id"), "v", "en").collect().head
    assert(prf.getLong(0) == 2 && prf.getLong(1) == 1 && prf.getLong(2) == 0)
    assert(prf.getDouble(3) == 0.6667 && prf.getDouble(4) == 1.0 && prf.getDouble(5) == 0.8)
  }
}

class FidelitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.pipeline.Extract
  import graft.model.Turn

  private def turn(text: String) =
    Turn("c", 0, "user", text, "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))

  test("per-turn lang populated from extracted text") {
    assert(Extract.extractTurn(turn("<p>the quick fox and a dog</p>")).lang == "en")
    assert(Extract.extractTurn(turn("<p>der hund und die katze</p>")).lang == "de")
    assert(Extract.extractTurn(turn("xyzzy")).lang == "und")
  }

  test("lines synthesized per block with word counts and raw spans") {
    val et = Extract.extractTurn(turn("<p>alpha beta gamma</p><p>delta</p>"))
    assert(et.lines.length == 2)
    assert(et.lines.map(_.nWords).sorted.toList == List(1, 3))
    val l = et.lines.maxBy(_.nWords)
    assert(l.begin == 3 && et.blocks.exists(_.id == l.blockId))
  }

  test("NFC normalization at word level; spans still index raw payload") {
    val decomposed = "café" // e + combining acute
    val et = Extract.extractTurn(turn(s"<p>$decomposed</p>"))
    assert(et.words.head.text == "café") // precomposed after NFC
    assert(et.words.head.begin == 3 && et.words.head.end == 8)
  }

  test("token class slot defaults to other") {
    val et = Extract.extractTurn(turn("<p>x</p>"))
    assert(et.words.forall(_.tokenClass == "other"))
  }
}

class RegisterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("SQL-surface UDF shims agree with the typed kernel path") {
    import spark.implicits._
    graft.functions.Register.all(spark)
    graft.sources.Turns.synth(spark, TestSpark.sfDir).limit(50)
      .toDF().createOrReplaceTempView("turns_udf_test")
    val viaSql = spark.sql(
      """SELECT conv_id, turn_idx,
         graft_extract_text(conv_id, turn_idx, text, tool) AS t,
         graft_lang_id(graft_extract_text(conv_id, turn_idx, text, tool)) AS l
         FROM turns_udf_test""")
      .as[(String, Int, String, String)].collect().sortBy(r => (r._1, r._2))
    val viaKernel = graft.pipeline.Extract
      .run(graft.sources.Turns.synth(spark, TestSpark.sfDir).limit(50))
      .select($"conv_id", $"turn_idx", $"extractedText", $"lang")
      .as[(String, Int, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(viaSql.sameElements(viaKernel))
  }
}
