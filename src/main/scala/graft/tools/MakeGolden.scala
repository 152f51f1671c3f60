package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: regenerate the committed golden file (run once per
  * intentional semantic change; the GoldenSpec diff gate catches
  * accidental ones).
  */
object MakeGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = graft.pipeline.Extract.run(graft.sources.Turns.synth(spark, "/root/testdata/sf0.001"))
      .filter($"turn_idx" < 3)
      .select($"conv_id", $"turn_idx", $"turn_id", $"lang", $"extractedText",
        $"metrics.blocksKept".as("blocks_kept"),
        $"metrics.wordCount".as("word_count"),
        to_json($"blocks").as("blocks_json"))
      .orderBy("conv_id", "turn_idx")
    val rows = out.toJSON.collect()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/src/test/resources/golden_turns.jsonl"),
      rows.mkString("\n").getBytes("UTF-8"))
    println(s"[golden] wrote ${rows.length} rows")
    spark.stop()
  }
}
