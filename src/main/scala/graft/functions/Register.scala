package graft.functions

import org.apache.spark.sql.SparkSession
import graft.model.Turn
import graft.pipeline.{Extract, ExtractConfig}

/** Thin SQL-surface parity shims (SURVEY §2.5: "register a thin
  * extract_turn UDF only for SQL-surface parity"). The production path
  * stays the typed `Extract.run` mapPartitions kernel — these UDFs
  * exist so SQL-text users can call the same per-turn semantics, e.g.
  * `SELECT graft_extract_text(conv_id, turn_idx, text, tool) FROM t`.
  */
object Register {
  def all(spark: SparkSession): Unit = {
    val cfg = ExtractConfig()
    spark.udf.register("graft_extract_text",
      (convId: String, turnIdx: Int, text: String, tool: String) =>
        Extract.extractTurn(Turn(convId, turnIdx, "user", text, tool, null), cfg)
          .extractedText)
    spark.udf.register("graft_lang_id",
      (text: String) => graft.operators.TextStats.langIdScala(text))
    spark.udf.register("graft_simhash64",
      (text: String) => graft.operators.Dedup.simhash64(if (text == null) "" else text))
  }
}
