package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan
  * the corpus once — the 100 TB shape: queries are small, corpus is
  * huge, no corpus self-join). Scale path: sign-bit LSH bucketing
  * (deterministic pseudo-random hyperplanes derived from xxhash64) so
  * the candidate set per query is one bucket instead of the corpus.
  * All dot products are `zip_with` + `aggregate` Column expressions.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (computed in
    * double).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Deterministic sign-bit bucket: bit p of the bucket = sign of
    * Σ_i v[i] * h(i, p), where h(i, p) is a fixed ±1 pseudo-random
    * hyperplane component derived from xxhash64(i, p). Pure Column
    * expression; the "random" planes are reproducible everywhere.
    */
  def signBits(v: Column, planes: Int): Column = {
    val withIdx = zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => struct(x.as("x"), i.as("i")))
    val bits = (0 until planes).map { p =>
      val proj = aggregate(withIdx, lit(0.0), (acc, s) =>
        acc + s.getField("x").cast("double") *
          when(xxhash64(s.getField("i"), lit(p)).bitwiseAND(1) === 1, 1.0).otherwise(-1.0))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Brute-force cosine top-k: for each query vector (small set,
    * broadcast), the k nearest corpus vectors. Deterministic
    * tie-break on corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN top-k: candidates = corpus vectors in the same
    * sign-bit bucket as the query (the scale path — per-query work is
    * one bucket, the join key is a long).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      signBits(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBits(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cos")
      .orderBy("query_id", "rank")
  }
}

/** Self-contained XXH64 (public-domain algorithm, Yann Collet) over a
  * string's UTF-8 bytes — used by kernels that need a fast 64-bit hash
  * outside Column space.
  */
object XxHash {
  private val P1 = -7046029288634856825L // 11400714785074694791
  private val P2 = -4417276706812531889L // 14029467366897019727
  private val P3 = 1609587929392839161L
  private val P4 = -8796714831421723037L // 9650029242287828579
  private val P5 = 2870177450012600261L

  def hashUtf8(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  def hashBytes(input: Array[Byte], seed: Long): Long = {
    val len = input.length
    var idx = 0
    var hash =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (idx <= len - 32) {
          v1 = round(v1, readLong(input, idx)); idx += 8
          v2 = round(v2, readLong(input, idx)); idx += 8
          v3 = round(v3, readLong(input, idx)); idx += 8
          v4 = round(v4, readLong(input, idx)); idx += 8
        }
        var h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        h = mergeRound(h, v1); h = mergeRound(h, v2)
        h = mergeRound(h, v3); h = mergeRound(h, v4)
        h
      } else seed + P5
    hash += len
    while (idx <= len - 8) {
      hash ^= round(0L, readLong(input, idx))
      hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
      idx += 8
    }
    if (idx <= len - 4) {
      hash ^= (readInt(input, idx) & 0xffffffffL) * P1
      hash = java.lang.Long.rotateLeft(hash, 23) * P2 + P3
      idx += 4
    }
    while (idx < len) {
      hash ^= (input(idx) & 0xffL) * P5
      hash = java.lang.Long.rotateLeft(hash, 11) * P1
      idx += 1
    }
    hash ^= hash >>> 33
    hash *= P2
    hash ^= hash >>> 29
    hash *= P3
    hash ^= hash >>> 32
    hash
  }

  private def round(acc: Long, in: Long): Long =
    java.lang.Long.rotateLeft(acc + in * P2, 31) * P1

  private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) | ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  private def readInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
}
