package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.io.Checkpoint
import graft.pipeline.ExtractConfig
import graft.sources.{Serializers, Turns}

/** Scratch driver: exercises checkpoint/resume + streaming through the
  * public API end-to-end (dev tool, not part of the driver contract).
  */
object DemoIo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val turns = Turns.synth(spark, "/root/testdata/sf0.001")
    val out = Files.createTempDirectory("demo_ckpt").toString
    val cfg = ExtractConfig(saltChunkSize = 16)
    println("[demo] stage + chunk 0+1 then simulated crash:")
    Checkpoint.stage(turns, out, 4, cfg)
    println("  " + Checkpoint.runChunk(spark, out, 0, cfg))
    println("  " + Checkpoint.runChunk(spark, out, 1, cfg))
    println("[demo] resume (expect 2 skipped, 2 executed):")
    Checkpoint.runAll(turns, out, 4, cfg).foreach(r => println("  " + r))
    val n = Checkpoint.readOutput(spark, out).count()
    println(s"[demo] checkpointed output rows = $n (input = ${turns.count()})")

    val inDir = Files.createTempDirectory("demo_sin").toString
    val sOut = Files.createTempDirectory("demo_sout").toString
    val ck = Files.createTempDirectory("demo_sck").toString
    turns.toDF().limit(100).coalesce(2).write.mode("overwrite").json(inDir)
    val q = graft.streaming.Stream
      .toParquetSink(graft.streaming.Stream.extractStream(spark, inDir), sOut, ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println(s"[demo] streamed extraction rows = ${spark.read.parquet(sOut).count()}")
    val sample = spark.read.parquet(sOut).select("conv_id", "turn_idx", "extractedText")
      .orderBy("conv_id", "turn_idx").limit(2).collect()
    sample.foreach(r => println(s"[demo] ${r.getString(0)}#${r.getInt(1)}: ${r.getString(2).take(60)}"))
    spark.stop()
  }
}
