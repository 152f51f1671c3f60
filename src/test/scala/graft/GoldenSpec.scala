package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Golden-file regression gate (reference strategy: canonical Page-JSON
  * assets, SURVEY §5 item 4): full extraction output for the first 3
  * turns of every conversation at sf0.001, committed as jsonl. Any
  * semantic drift in segmentation / ordering / classification /
  * metrics / ids fails this diff.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extraction output matches the committed golden file") {
    import spark.implicits._
    val actual = graft.pipeline.Extract.run(graft.sources.Turns.synth(spark, TestSpark.sfDir))
      .filter($"turn_idx" < 3)
      .select($"conv_id", $"turn_idx", $"turn_id", $"lang", $"extractedText",
        $"metrics.blocksKept".as("blocks_kept"),
        $"metrics.wordCount".as("word_count"),
        to_json($"blocks").as("blocks_json"))
      .orderBy("conv_id", "turn_idx")
      .toJSON.collect()

    val goldenUrl = getClass.getResource("/golden_turns.jsonl")
    assert(goldenUrl != null, "golden_turns.jsonl missing from test resources")
    val golden = scala.io.Source.fromURL(goldenUrl, "UTF-8").getLines().toArray

    assert(actual.length == golden.length,
      s"row count drift: ${actual.length} vs golden ${golden.length}")
    val diffs = actual.zip(golden).zipWithIndex.collect {
      case ((a, g), i) if a != g => s"row $i:\n  actual: ${a.take(200)}\n  golden: ${g.take(200)}"
    }
    assert(diffs.isEmpty, diffs.take(3).mkString("\n"))
  }
}
