package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.pipeline.Extract
import graft.sources.Turns

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB-runnable SQL in
  * [[oracleSql]] (same column names, driver hash-compares) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * rows-only check and correctness is covered by ScalaTest.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  /** Flagship: the full extraction pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Extract.run(Turns.synth(spark, "/root/testdata/sf0.001"))
      .select($"conv_id", $"turn_idx", $"extractedText".as("extracted_text"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction pipeline (SURVEY §2.3) ----
    "x1_extract" -> ((s, dir) => {
      import s.implicits._
      Extract.run(Turns.synth(s, dir))
        .select($"conv_id", $"turn_idx", $"extractedText".as("extracted_text"))
    }),
    "x3_stats" -> ((s, dir) => {
      import s.implicits._
      Extract.run(Turns.synth(s, dir))
        .select($"conv_id", $"turn_idx",
          $"metrics.wordCount".as("word_count"),
          $"metrics.blocksKept".as("blocks_kept"),
          $"metrics.blocksDropped".as("blocks_dropped"))
    }),
    "x4_turns" -> ((s, dir) =>
      Turns.synth(s, dir).toDF()
        .select("conv_id", "turn_idx", "role", "text", "tool")),

    // ---- dataflow / relational operators (SURVEY §2.1, §2.5) ----
    // MapData fused map+filter (dataflow/common.py:100)
    "q_mapdata_filter" -> ((s, dir) =>
      lineitem(s, dir)
        .filter(col("l_quantity") > 25)
        // floor-of-cents: bit-identical across engines (round() halves
        // diverge between decimal- and binary-rounding implementations)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long").as("net_cents"))),
    // streaming mean/std (dataflow/stats.py:32/:153) → built-in aggs
    "q_stats_mean_std" -> ((s, dir) =>
      lineitem(s, dir).agg(
        round(avg("l_quantity"), 4).as("mean_qty"),
        round(stddev("l_quantity"), 4).as("std_qty"),
        round(avg("l_extendedprice"), 4).as("mean_price"))),
    // LabelSummarizer (mapper/maputils.py:214) → groupBy count
    "q_label_summarizer" -> ((s, dir) =>
      docs(s, dir).groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")),
    // FlattenData (dataflow/common.py:77) → explode
    "q_flatten_words" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))),
    // ConcatData (dataflow/common.py:217) → unionByName
    "q_concat_union" -> ((s, dir) => {
      val d = docs(s, dir)
      d.filter(col("doc_id") % 2 === 0).unionByName(d.filter(col("doc_id") % 2 === 1))
        .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    }),
    // TPC-H Q1-style aggregation
    "q1_agg" -> ((s, dir) =>
      lineitem(s, dir).groupBy("l_returnflag", "l_linestatus").agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))),
    // broadcast equi-join (small dim side explicitly broadcast)
    "q2_join_broadcast" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val part = s.read.parquet(s"$dir/part.parquet")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy("p_brand").agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),
    // multi-join + top-k with deterministic ordering
    "q3_topk" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val li = lineitem(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"), col("c_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    // ---- training-data pipeline ops ----
    // exact dedup: hash-groupBy on content (scale path: shuffle on
    // md5(text), not on the full payload)
    "q_dedup_exact" -> ((s, dir) =>
      docs(s, dir).groupBy(md5(col("text")).as("text_hash"))
        .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("copies"))
        .select("keeper_id", "copies")),
    // token counting (whitespace tokenizer)
    "q_token_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        col("n_chars"))),
    // document fingerprinting: md5 of normalized text
    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint")))
  )

  def oracleSql: Map[String, String] = {
    val cte = Turns.TurnsCte
    Map(
      "x1_extract" ->
        s"""$cte SELECT conv_id, turn_idx, ${Turns.ExpectedExtractedSql} AS extracted_text FROM turns""",
      "x3_stats" ->
        s"""$cte SELECT conv_id, turn_idx, ${Turns.ExpectedWordCountSql} AS word_count,
            ${Turns.ExpectedBlocksKeptSql} AS blocks_kept,
            ${Turns.ExpectedBlocksDroppedSql} AS blocks_dropped FROM turns""",
      "x4_turns" ->
        s"""$cte SELECT conv_id, turn_idx, role, text, tool FROM turns""",
      "q_mapdata_filter" ->
        """SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_cents
           FROM lineitem WHERE l_quantity > 25""",
      "q_stats_mean_std" ->
        """SELECT round(avg(l_quantity), 4) AS mean_qty, round(stddev(l_quantity), 4) AS std_qty,
           round(avg(l_extendedprice), 4) AS mean_price FROM lineitem""",
      "q_label_summarizer" ->
        "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
      "q_flatten_words" ->
        """SELECT w AS word, count(*) AS n FROM (
             SELECT unnest(string_split(text, ' ')) AS w FROM documents
           ) GROUP BY w""",
      "q_concat_union" ->
        """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars FROM (
             SELECT * FROM documents WHERE doc_id % 2 = 0
             UNION ALL SELECT * FROM documents WHERE doc_id % 2 = 1
           ) GROUP BY source""",
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price, round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus""",
      "q2_join_broadcast" ->
        """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n
           FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",
      "q3_topk" ->
        """SELECT o_orderkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
           GROUP BY o_orderkey, c_name ORDER BY revenue DESC, o_orderkey LIMIT 10""",
      "q_dedup_exact" ->
        """SELECT min(doc_id) AS keeper_id, count(*) AS copies FROM documents GROUP BY md5(text)""",
      "q_token_count" ->
        """SELECT doc_id, CAST(length(string_split(text, ' ')) AS INT) AS n_tokens, n_chars FROM documents""",
      "q_fingerprint" ->
        """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint FROM documents"""
    )
  }
}
