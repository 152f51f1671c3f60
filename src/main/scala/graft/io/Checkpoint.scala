package graft.io

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{ExtractedTurn, Turn}
import graft.pipeline.{Extract, ExtractConfig}

/** Chunked checkpoint/resume for the extraction job (north rule:
  * per-partition progress, exactly-once resumability, lineage +
  * metrics).
  *
  * The input is split into `numChunks` deterministic chunks by the
  * same salted key the kernel partitions on
  * (`pmod(hash(conv_id, turn_idx/salt), numChunks)`); each chunk is
  * extracted and written to `out/chunk=<k>` with mode=overwrite, and a
  * `_DONE_<k>` marker (carrying the chunk's row count + metrics JSON)
  * is committed only after the write succeeds. Resume skips chunks
  * whose marker exists; a chunk that crashed mid-write is simply
  * overwritten — overwrite-by-chunk makes the retry idempotent, so
  * the end state equals a single uninterrupted run (exactly-once
  * observable effect, at-least-once execution).
  *
  * On a real cluster the same protocol rides Iceberg: one
  * `overwrite-by-filter(chunk = k)` snapshot commit per chunk with the
  * metrics in snapshot summary properties; `_DONE_` markers are the
  * filesystem stand-in this sandbox can test.
  */
object Checkpoint {

  final case class ChunkResult(chunk: Int, rows: Long, skipped: Boolean)

  private def markerPath(outDir: String, k: Int) = Paths.get(outDir, s"_DONE_$k")

  def runChunk(turns: Dataset[Turn], outDir: String, k: Int, numChunks: Int,
      cfg: ExtractConfig): ChunkResult = {
    if (Files.exists(markerPath(outDir, k))) return ChunkResult(k, 0L, skipped = true)
    val chunkExpr = pmod(hash(col("conv_id"), floor(col("turn_idx") / cfg.saltChunkSize)),
      lit(numChunks))
    val part = turns.filter(chunkExpr === k)
    val extracted = Extract.run(part, cfg)
    extracted.write.mode("overwrite").parquet(s"$outDir/chunk=$k")
    // metrics from the written files (what actually committed) — the
    // Iceberg analogue stores these in snapshot summary properties
    val stats = turns.sparkSession.read.parquet(s"$outDir/chunk=$k")
      .agg(count(lit(1)), coalesce(sum(col("metrics.wordCount")), lit(0L)),
        coalesce(sum(when(col("metrics.parseFailed"), 1).otherwise(0)), lit(0L)))
      .head()
    val rows = stats.getLong(0)
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(markerPath(outDir, k),
      s"""{"chunk":$k,"rows":$rows,"words":${stats.getLong(1)},"parse_failures":${stats.getLong(2)}}""")
    ChunkResult(k, rows, skipped = false)
  }

  /** Run all chunks (resuming past completed ones). Returns per-chunk
    * results; the completed output is `readOutput(outDir)`.
    */
  def runAll(turns: Dataset[Turn], outDir: String, numChunks: Int,
      cfg: ExtractConfig = ExtractConfig()): Seq[ChunkResult] = {
    Files.createDirectories(Paths.get(outDir))
    (0 until numChunks).map(k => runChunk(turns, outDir, k, numChunks, cfg))
  }

  def readOutput(spark: SparkSession, outDir: String): Dataset[ExtractedTurn] = {
    import spark.implicits._
    spark.read.parquet(s"$outDir/chunk=*").as[ExtractedTurn]
  }
}
