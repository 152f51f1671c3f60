package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators: benchmark decontamination,
  * corpus-wide exact line deduplication, and deterministic stratified
  * quota sampling.
  *
  * These extend the dedup/quality family ([[Dedup]], [[TextStats]])
  * with the three remaining passes a large-scale LLM training-data
  * pipeline runs before publishing a corpus:
  *
  *  - '''decontamination''' — drop/flag training documents that share
  *    word n-grams with an evaluation benchmark (the GPT-3 appendix-C /
  *    Llama-style 13-gram overlap check; here k is a parameter). The
  *    benchmark side is eval sets — bounded and tiny relative to the
  *    corpus — so it is collected and broadcast; the corpus side is a
  *    map-only pass: at 100 TB this costs ZERO shuffle.
  *  - '''line dedup''' — C4 §2.2-style: keep only the first occurrence
  *    of every distinct "line" across the whole corpus. The
  *    groupBy(line) is the one canonical corpus-wide exchange, hash
  *    partitioned by line; the join-back reuses the same key so AQE
  *    plans it without a second full shuffle of the line table.
  *  - '''quota sampling''' — per-stratum (e.g. language) sampling with
  *    two verdicts: a Lehmer-hash rate threshold (map-only, exact in
  *    expectation — the 100 TB path) and an exact top-N rank within
  *    the stratum (one sort-exchange keyed by stratum; documented skew
  *    caveat — with few strata prefer the threshold path at extreme
  *    scale, or a two-phase quantile cut).
  *
  * All tie-breaks and hash arithmetic are integer-exact and expressible
  * in ANSI SQL, so every operator carries a full DuckDB oracle.
  */
object Corpus {

  /** Word k-grams of `text` under split-by-single-space semantics —
    * identical to `string_split(text, ' ')` + slicing in SQL. Empty
    * when the text has fewer than k words.
    */
  def wordGrams(text: String, k: Int): Iterator[String] = {
    val ws = (if (text == null) "" else text).split(" ", -1)
    if (ws.length < k) Iterator.empty
    else (0 to ws.length - k).iterator.map(i => ws.slice(i, i + k).mkString(" "))
  }

  /** Distinct word k-grams of a (small) benchmark document set, as a
    * single-column `gram` DataFrame. The explode+distinct shuffle runs
    * over the benchmark only — never the corpus.
    */
  def benchmarkGrams(bench: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = bench.sparkSession
    import spark.implicits._
    bench.select(col(textCol)).as[String]
      .flatMap(t => wordGrams(t, k))
      .distinct()
      .toDF("gram")
  }

  /** Flag corpus rows that share any word k-gram with the benchmark
    * gram set. Returns `(idCol, n_gram_hits, n_distinct_hits,
    * contaminated)` for EVERY corpus row (zero-hit rows included, so
    * the output is a per-document verdict table, not a match list).
    *
    * The benchmark grams are collected to the driver and broadcast —
    * bounded state by construction (eval benchmarks are MBs, the
    * corpus is the 100 TB side) — making the corpus pass map-only.
    * The declarative alternative (explode corpus grams + join) would
    * shuffle ~k× the corpus text.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchGrams: DataFrame, k: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val grams: Set[String] = benchGrams.as[String].collect().toSet
    val bc = spark.sparkContext.broadcast(grams)
    corpus.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val set = bc.value
        it.map { case (id, text) =>
          var hits = 0
          val distinct = new java.util.HashSet[String]()
          val gs = wordGrams(text, k)
          while (gs.hasNext) {
            val g = gs.next()
            if (set.contains(g)) { hits += 1; distinct.add(g) }
          }
          (id, hits, distinct.size, hits > 0)
        }
      }
      .toDF(idCol, "n_gram_hits", "n_distinct_hits", "contaminated")
  }

  /** Corpus-level exact line dedup: across ALL documents, keep only
    * the first occurrence — lowest (doc, position) — of each distinct
    * line, then reassemble each document from its kept lines in
    * original order. "Lines" are 8-word chunks (the corpus is
    * single-line text, so literal newline splitting would be vacuous —
    * same convention as [[TextStats.repetitionMetrics]]).
    *
    * Returns `(idCol, n_lines, n_kept, kept_text)`; documents whose
    * every line was seen earlier come back with `n_kept = 0` and an
    * empty `kept_text` rather than vanishing.
    *
    * Scale: one hash exchange on `line` (groupBy + join-back on the
    * same key), one on `idCol` for reassembly — the minimum for
    * corpus-wide first-occurrence semantics. min(struct) keeps the
    * tie-break exact without encoding tricks, so document ids and
    * positions are unbounded.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lines = docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val ws = (if (text == null) "" else text).split(" ", -1)
        val m = (ws.length + 7) / 8
        (0 until m).iterator.map { j =>
          (id, j, ws.slice(j * 8, math.min(j * 8 + 8, ws.length)).mkString(" "))
        }
      })
      .toDF(idCol, "line_idx", "line")
    val first = lines.groupBy("line")
      .agg(min(struct(col(idCol), col("line_idx"))).as("fp"))
    val kept = lines.join(first, "line")
      .filter(col(idCol) === col(s"fp.$idCol") && col("line_idx") === col("fp.line_idx"))
    val perDoc = kept.groupBy(idCol).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("line_idx"), col("line")))),
          x => x("line")),
        " ").as("kept_text"))
    val totals = lines.groupBy(idCol).agg(count(lit(1)).as("n_lines"))
    totals.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Modulus / multiplier of the Lehmer (Park–Miller) hash used for
    * sampling keys — integer-exact in both Spark and ANSI SQL.
    */
  val LehmerMod = 2147483647L
  val LehmerMul = 48271L

  /** `((id % 2^31) * 48271) % (2^31-1) % 1000` — the deterministic
    * per-row sampling key in [0, 1000).
    */
  def sampleKey(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((id % lit(2147483648L)) * lit(LehmerMul)) % lit(LehmerMod) % lit(1000L)

  /** Deterministic stratified quota sampling. Emits one row per input
    * document: `(idCol, stratum, sample_key, kept_rate, kept_rank)`.
    *
    *  - `kept_rate`: `sample_key < rates(stratum)` (per-mille rate;
    *    `defaultRate` for unlisted strata). Map-only — the path you
    *    run at 100 TB.
    *  - `kept_rank`: exact top-`rankQuota` per stratum by
    *    (sample_key, id) — one sort-exchange partitioned by stratum.
    *    Exact counts, but strata are few ⇒ skewed at extreme scale;
    *    prefer `kept_rate` there.
    */
  def quotaSample(docs: DataFrame, idCol: String, stratumCol: String,
      rates: Seq[(String, Int)], defaultRate: Int, rankQuota: Int): DataFrame = {
    val key = sampleKey(col(idCol))
    val rate = rates.foldRight(lit(defaultRate)) { case ((s, r), acc) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol)).orderBy(key.asc, col(idCol).asc)
    docs.select(col(idCol), col(stratumCol).as("stratum"),
      key.cast("int").as("sample_key"),
      (key < rate).as("kept_rate"),
      (row_number().over(w) <= rankQuota).as("kept_rank"))
  }
}
