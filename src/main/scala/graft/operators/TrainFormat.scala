package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sample formatting over the transcript table — the last
  * mile of a training-data pipeline: turning curated conversations
  * into the strings + span metadata an LM trainer actually consumes.
  *
  * Two operators:
  *
  *  - [[renderChat]]: chat-template rendering. Each conversation's
  *    turns are rendered in `turn_idx` order as
  *    `<|role|>\n<text>\n` pieces concatenated into ONE training
  *    string, and every turn reports the character offsets of its
  *    text region inside that string plus a loss-mask flag
  *    (train-on-assistant-only — the standard SFT masking rule).
  *    Offsets let a trainer map token-level labels back to turns
  *    without re-parsing the rendered string.
  *
  *  - [[packSamples]]: greedy sequence packing. Turns are packed, in
  *    conversation order, into samples of at most `budget` tokens
  *    (a turn that alone exceeds the budget still occupies exactly
  *    one sample — truncation is the trainer's decision, not ours).
  *    This is the classic "example packing" step that keeps context
  *    windows dense instead of padding every conversation to max
  *    length.
  *
  * Scale shape: both operators need each conversation's turns
  * together and in order — that is inherent to the semantics (a
  * rendered sample IS a whole conversation slice), not an
  * implementation choice. [[renderChat]] does it with ONE hash
  * exchange on `conv_id` (the window and the per-conversation hash
  * aggregation reuse the same partitioning, so Catalyst plans a
  * single Exchange). [[packSamples]] does it with one
  * `repartition(conv_id) + sortWithinPartitions` and a STREAMING
  * per-partition walk — no `groupByKey` buffering, so a pathological
  * million-turn conversation flows through in O(1) memory instead of
  * materializing as one in-memory group. Conversation length is
  * bounded by product semantics (a context window), so the per-key
  * skew ceiling is low; the giant synthetic `conv-big` (40% of all
  * turns) exercises exactly this path.
  */
object TrainFormat {

  /** Rendered piece for one turn: `<|` + role + `|>` + '\n' + text +
    * '\n'. Kept as a Column expression (and mirrored literally in the
    * oracle SQL) so both engines hash the same bytes.
    */
  def pieceCol: Column =
    concat(lit("<|"), col("role"), lit("|>\n"), col("text"), lit("\n"))

  /** Chat-template rendering with per-turn text spans and loss masks.
    *
    * Output per turn: `(conv_id, turn_idx, role, t_begin, t_end,
    * mask, conv_md5)` where `[t_begin, t_end)` are character (code
    * point) offsets of the turn's text inside the conversation's
    * rendered string, `mask` is 1 for assistant turns (the tokens a
    * trainer computes loss on), and `conv_md5` is the md5 of the full
    * rendered string — the cheap whole-string witness that the
    * concatenation itself (not just the arithmetic) is right.
    *
    * The running offset is a window sum of piece lengths over
    * `(conv_id, turn_idx)` — lengths count Unicode code points in
    * both Spark and DuckDB, so combining-character payloads (template
    * 10) stay in parity. The md5 hashes the UTF-8 bytes on both
    * sides.
    */
  def renderChat(turns: DataFrame): DataFrame = {
    val withPiece = turns.select(
      col("conv_id"), col("turn_idx"), col("role"), col("text"),
      pieceCol.as("piece"))
    val wPrev = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    // header "<|" + role + "|>\n" is length(role) + 5 code points
    val tBegin = col("prev") + length(col("role")) + lit(5)
    val offsets = withPiece
      .withColumn("prev",
        coalesce(sum(length(col("piece")).cast("long")).over(wPrev), lit(0L)))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        tBegin.cast("long").as("t_begin"),
        (tBegin + length(col("text"))).cast("long").as("t_end"),
        when(col("role") === "assistant", 1).otherwise(0)
          .cast("int").as("mask"))
    // Whole-string witness: md5 of the pieces concatenated in turn
    // order. collect_list buffers one conversation's pieces per group
    // — bounded by the context-window ceiling discussed above; the
    // offsets themselves never materialize the string.
    val convHash = withPiece.groupBy("conv_id")
      .agg(md5(array_join(
        transform(
          array_sort(collect_list(struct(col("turn_idx"), col("piece")))),
          x => x.getField("piece")),
        "")).as("conv_md5"))
    // co-partitioned on conv_id with the window above — no extra shuffle
    offsets.join(convHash, Seq("conv_id"))
  }

  /** Greedy per-conversation sequence packing.
    *
    * Walks each conversation's turns in `turn_idx` order keeping a
    * running token total; when adding the next turn would exceed
    * `budget`, a new sample starts with that turn. Token counts are
    * whitespace tokens (`size(split(text, ' '))` — the q_token_count
    * parity idiom), and the walk is the exact recurrence the DuckDB
    * recursive-CTE oracle replays:
    *
    *   turn 0:  sample = 0, acc = tok
    *   turn i:  acc + tok > budget  →  sample += 1, acc = tok
    *            otherwise           →  acc += tok
    *
    * (`acc + tok == budget` still fits — the boundary is inclusive.)
    *
    * Implementation is a single `repartition(conv_id)` +
    * `sortWithinPartitions(conv_id, turn_idx)` + streaming
    * mapPartitions walk with state reset on conversation change —
    * one shuffle, zero group buffering.
    */
  def packSamples(turns: DataFrame, budget: Int): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        size(split(col("text"), " ")).as("tok"))
      .repartition(col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .as[(String, Int, Int)]
      .mapPartitions { it =>
        var conv: String = null
        var acc = 0L
        var sample = 0
        it.map { case (c, t, tok) =>
          if (c != conv) { conv = c; sample = 0; acc = tok.toLong }
          else if (acc + tok > budget) { sample += 1; acc = tok.toLong }
          else acc += tok
          (c, t, sample, tok)
        }
      }
      .toDF("conv_id", "turn_idx", "sample_idx", "tok")
  }
}
