package graft.operators

import org.apache.spark.sql.DataFrame
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
    * One typed per-group kernel, ONE payload shuffle. The declarative
    * alternative (window running sum for offsets + collect_list
    * aggregation for the digest) shuffles the payload TWICE — Catalyst
    * prunes the window out of the aggregation branch, so the two
    * consumers never share an exchange — and buffers exactly the same
    * per-conversation piece list inside ObjectHashAggregate that this
    * kernel buffers directly; the kernel also renders and hashes each
    * conversation once instead of re-deriving pieces per branch.
    * Offsets count Unicode CODE POINTS (what `length()` means in both
    * Spark and DuckDB), not UTF-16 units — `codePointCount`, pinned by
    * the non-BMP spec case. The md5 hashes the UTF-8 bytes, same as
    * both engines' md5(string).
    */
  def renderChat(turns: DataFrame): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    turns
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), col("text"))
      .as[(String, Int, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        // buffers ONE conversation — bounded by the context-window
        // ceiling (same bound the aggregate alternative needs)
        val ts = it.toArray.sortBy(_._2)
        val sb = new java.lang.StringBuilder
        var at = 0L
        val spans = ts.map { case (_, idx, role, text) =>
          val hdr = s"<|$role|>\n"
          sb.append(hdr).append(text).append('\n')
          val b = at + cp(hdr)
          val e = b + cp(text)
          at = e + 1
          (idx, role, b, e, if (role == "assistant") 1 else 0)
        }
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        spans.iterator.map { case (idx, role, b, e, m) =>
          (conv, idx, role, b, e, m, digest)
        }
      }
      .toDF("conv_id", "turn_idx", "role", "t_begin", "t_end", "mask",
        "conv_md5")
  }

  /** Transcript linting — conversation-STRUCTURE validation, the gate
    * an ingest pipeline runs before any content-quality scoring:
    *
    *  - `starts_ok`: the first turn (lowest `turn_idx`) is `user` or
    *    `system` — a transcript opening with an assistant reply lost
    *    its head upstream.
    *  - `contiguous_ok`: turn indices are exactly `0..n-1` (no gaps,
    *    no duplicates — a gap means turns were dropped mid-export).
    *  - `no_empty_text`: no turn has empty text.
    *  - `tool_ok`: tool payloads appear only on `tool`-role turns.
    *  - `assistant_runs`: count of distinct indices `i` where an
    *    assistant turn at `i` is directly followed (at `i+1`) by an
    *    assistant turn — doubled replies from retry bugs. Existence
    *    semantics by VALUE, so neither sort-position ties under
    *    duplicate indices nor gaps can fake or split a run (a lag
    *    window would count tie groups shuffle-order-dependently).
    *  - `lint_ok`: all of the above (with `assistant_runs` reported,
    *    not gating — some products legitimately stream multi-part
    *    replies).
    *
    * ONE pure groupBy = one conv_id exchange (no window): the index
    * sets are `collect_set` columns bounded by conversation length —
    * the same bound every per-conversation operator here carries —
    * and runs fall out as `|aset ∩ (aset+1)|`. Contiguity is the
    * (min=0, max=n-1, n distinct) characterization; the oracle
    * re-derives it via the arithmetic-series sum and the runs via a
    * self-join — different proofs of every flag. Under duplicate
    * MINIMAL indices with conflicting roles the first-turn pick is
    * tie-nondeterministic (as is any argmin) — such conversations
    * already fail `contiguous_ok`.
    */
  def lintConversations(turns: DataFrame): DataFrame = {
    val t = turns.select(col("conv_id"),
      col("turn_idx").cast("int").as("turn_idx"),
      col("role"), col("text"), col("tool"))
    val n = count(lit(1))
    val aset = collect_set(when(col("role") === "assistant", col("turn_idx")))
    t.groupBy("conv_id").agg(
      n.cast("int").as("n_turns"),
      min_by(col("role"), col("turn_idx")).isin("user", "system").as("starts_ok"),
      (min("turn_idx") === 0 && max("turn_idx") === n.cast("int") - 1 &&
        size(collect_set(col("turn_idx"))) === n).as("contiguous_ok"),
      (min(length(col("text"))) > 0).as("no_empty_text"),
      (min(when(col("tool") === "" || col("role") === "tool", 1).otherwise(0)) === 1)
        .as("tool_ok"),
      size(array_intersect(aset, transform(aset, i => i + 1)))
        .as("assistant_runs"))
      .withColumn("lint_ok",
        col("starts_ok") && col("contiguous_ok") && col("no_empty_text") &&
          col("tool_ok"))
  }

  /** Context-window truncation: keep the SUFFIX of each conversation
    * that fits `budget` tokens — the "most recent history first" rule
    * every chat stack applies when a conversation outgrows the model's
    * context (drop the oldest turns, never the newest). A turn is kept
    * iff the token total from it through the end of its conversation
    * is within budget; suffix sums are non-increasing in `turn_idx`,
    * so the kept set is always a contiguous suffix.
    *
    * Declarative on purpose: ONE window (suffix running sum over the
    * conv_id exchange) — unlike [[packSamples]] there is no
    * reset-on-overflow state, so the plain window expresses it and
    * Catalyst keeps it in one exchange. The frame is a DESCENDING
    * RANGE running sum, not `(currentRow, unboundedFollowing)` over
    * ascending rows: Spark evaluates an unbounded-FOLLOWING frame by
    * recomputing the aggregate from scratch at every row (rows leave
    * the frame's front) — O(n²) inside the giant-conversation
    * partition this repo deliberately plants — while the
    * unbounded-PRECEDING frame is incremental O(n); and RANGE (not
    * ROWS) makes duplicate turn_idx values share one suffix total,
    * the same `b.turn_idx >= a.turn_idx` semantics as the oracle's
    * self-join instead of a shuffle-order-dependent split. The oracle
    * re-derives the suffix sums with that self-join aggregation, an
    * algorithm this plan never runs.
    */
  def contextTrim(turns: DataFrame, budget: Int,
      tokenCounter: Option[String => Int] = None): DataFrame = {
    val wSuf = Window.partitionBy("conv_id").orderBy(col("turn_idx").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        // null text counts as ONE empty token (the Corpus.budgetPrefix
        // convention): without the coalesce the null tok silently
        // leaves the window sum, undercounting every suffix above it
        tokCol(tokenCounter).as("tok"))
      .withColumn("suffix_tokens", sum(col("tok").cast("long")).over(wSuf))
      .withColumn("kept", col("suffix_tokens") <= budget)
  }

  /** The ONE budget token-count column — see TextStats.tokenCountCol
    * for the null/"" convention (shared with Corpus.budgetPrefix).
    */
  private def tokCol(tokenCounter: Option[String => Int]): org.apache.spark.sql.Column =
    TextStats.tokenCountCol(tokenCounter, col("text"))

  /** Greedy per-conversation sequence packing.
    *
    * Walks each conversation's turns in `turn_idx` order keeping a
    * running token total; when adding the next turn would exceed
    * `budget`, a new sample starts with that turn. Token counts are
    * whitespace tokens (`size(split(text, ' '))` — the q_token_count
    * parity idiom) unless a real `tokenCounter` is threaded in, and
    * the walk is the exact recurrence the DuckDB recursive-CTE oracle
    * replays:
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
  def packSamples(turns: DataFrame, budget: Int,
      tokenCounter: Option[String => Int] = None): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        // same null convention as contextTrim — and here a null tok
        // would crash the task outright (non-nullable Int in the
        // tuple encoder), not just miscount
        tokCol(tokenCounter).as("tok"))
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
