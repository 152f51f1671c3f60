package graft.tools
import org.apache.spark.sql.SparkSession
import graft.model._
import graft.kernels._
import graft.pipeline.{Extract, ExtractConfig}

/** Scratch: stage-level timing of the extraction kernel. */
object KernelProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sample = graft.sources.Turns.synth(spark, "/root/testdata/sf0.01").collect()
    // replicate sample 40x for measurable times
    val turns = Array.fill(40)(sample).flatten
    val cfg = ExtractConfig()
    // warm
    for (_ <- 1 to 3) turns.foreach(t => Extract.extractTurn(t, cfg))
    def calib(): Unit = {
      val t0 = System.nanoTime()
      var i = 0; var acc = 0
      while (i < 300000) { acc += Ids.uuid3("calibration-string-" + (i % 97)).length; i += 1 }
      println(f"[kprof] calib_md5 ${(System.nanoTime()-t0)/1e6}%.0f ms (acc=$acc)")
    }
    calib()
    def time(name: String)(f: Turn => Any): Unit = {
      val t0 = System.nanoTime()
      turns.foreach(f)
      println(f"[kprof] $name ${(System.nanoTime()-t0)/1e3/turns.length}%.1f us/turn")
    }
    for (r <- 1 to 3) time(s"full_$r")(t => Extract.extractTurn(t, cfg))
    val noLines = cfg.copy(emitLines = false)
    for (r <- 1 to 2) time(s"nolines_$r")(t => Extract.extractTurn(t, noLines))
    val noIds = cfg.copy(emitLines = false, emitWordIds = false)
    for (r <- 1 to 2) time(s"noids_$r")(t => Extract.extractTurn(t, noIds))
    time("segment")(t => Segment.segment(if (t.text.nonEmpty) t.text else t.tool))
    time("tokenize_only")(t => Html.tokenize(if (t.text.nonEmpty) t.text else t.tool))
    time("tables")(t => { val p = if (t.text.nonEmpty) t.text else t.tool
      if (p.contains("<table")) Table.parseTables(p) else Nil })
    time("uuid_per_word")(t => {
      val seg = Segment.segment(if (t.text.nonEmpty) t.text else t.tool)
      val turnId = Ids.turnId(t.conv_id, t.turn_idx)
      seg.blocks.foreach(b => b.words.foreach(w => Ids.annId(turnId, "word", w.begin, w.end)))
    })
    time("langid")(t => graft.operators.TextStats.langIdScala(t.text))
    spark.stop()
  }
}
