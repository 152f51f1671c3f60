package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline.
  *
  * Scale design (100 TB): every variant shuffles only small keys
  * (hashes / signatures / band buckets), never full payloads;
  * candidate generation is a hash-bucket equi-join, and only candidate
  * PAIRS (a tiny fraction) are verified. Signature computation is pure
  * Column expressions (codegen'd, no UDFs) except SimHash, which is a
  * typed mapPartitions kernel (64 bit-votes don't fit whole-stage
  * codegen limits as one expression tree).
  */
object Dedup {

  /** MinHash signature, pure Column space:
    * sig[i] = min over distinct char-k-shingles s of xxhash64(s, i).
    *
    * NOTE: kept for reference/tests, but [[minhashSignatures]] (typed
    * kernel) is what the LSH operators use — nested `transform`
    * lambdas re-evaluate the shingle subtree once per outer index
    * (64× per row), which is a 50× slowdown Catalyst cannot CSE away.
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    val sh = array_distinct(
      transform(sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
        i => norm.substr(i, lit(k))))
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))
  }

  /** Normalized distinct char-k-shingles (pure Scala). */
  def shinglesOf(text: String, k: Int): Array[String] = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ")
    if (norm.length <= k) Array(norm)
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + k <= norm.length) { seen.add(norm.substring(i, i + k)); i += 1 }
      seen.toArray(new Array[String](seen.size))
    }
  }

  /** One-pass MinHash signature kernel: each shingle is hashed ONCE
    * (XXH64 seed 42), then re-seeded per signature slot with a cheap
    * avalanche mix — O(shingles + numHashes·shingles-long-mixes)
    * instead of the Column-space O(numHashes × full-shingle-recompute).
    */
  def minhashSig(text: String, k: Int, numHashes: Int): Array[Long] = {
    val sh = shinglesOf(if (text == null) "" else text, k)
    val base = sh.map(s => XxHash.hashUtf8(s, 42L))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < numHashes) {
      val seed = i * -7046029288634856825L + 2870177450012600261L
      var j = 0
      while (j < base.length) {
        // xorshift-multiply avalanche of (h0 ^ seed)
        var h = base(j) ^ seed
        h ^= h >>> 33; h *= -4417276706812531889L; h ^= h >>> 29
        if (h < sig(i)) sig(i) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** (id, signature, shingles) per row via one typed pass. */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, minhashSig(t, k, numHashes), shinglesOf(if (t == null) "" else t, k))
      })
      .toDF("id", "sig", "sh")
  }

  /** LSH near-duplicate pairs via banded MinHash: band-bucket join on
    * (band, bandHash), then signature-agreement Jaccard estimate.
    * Returns (id_a, id_b, jaccard_est) with id_a < id_b.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = signatures(df, idCol, textCol, k, numHashes).select("id", "sig")

    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")

    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()

    val agree = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    cand.select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("jaccard_est"))
      .filter(col("jaccard_est") >= jaccardThreshold)
      .orderBy("id_a", "id_b")
  }

  /** MinHash-LSH candidates verified with EXACT shingle Jaccard: the
    * production near-dup shape — LSH prunes the pair space, then only
    * candidate pairs re-join content (by id, so the band join still
    * never shuffles payloads) and compute exact set Jaccard.
    * At threshold ≥0.95 the banded-LSH miss probability is
    * (1−j^rows)^bands ≈ 7e−14, so the output equals the brute-force
    * all-pairs answer and a closed-form oracle can verify it.
    */
  def minhashLshExactPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      jaccardThreshold: Double = 0.95): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSh = signatures(df, idCol, textCol, k, numHashes)
    val banded = withSh.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()

    val shingled = withSh.select(col("id"), col("sh"))
    cand
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash of the lowercase token sequence. Pure Scala (used
    * from a typed kernel): bit j = sign of Σ_tokens ±1 by bit j of the
    * token hash (xxhash64 seed 42 — same as Spark's `xxhash64(tok)`).
    */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
        val h = XxHash.hashUtf8(text.substring(s, i).toLowerCase, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** SimHash near-dup pairs: 4 × 16-bit bands, hamming ≤ maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, simhash64(if (t == null) "" else t)) })
      .toDF("id", "sig")
    // 16-bit band values with Scala-side shift amounts (Column shifts
    // need literal ints)
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band"), shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("band_bits")))
    val exploded = sigs.select(col("id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.band_bits").as("band_bits"))
    val a = exploded.select(col("band"), col("band_bits"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = exploded.select(col("band"), col("band_bits"), col("id").as("id_b"), col("sig").as("sig_b"))
    val hamming = (0 until 64).map(j =>
      shiftright(col("sig_a").bitwiseXOR(col("sig_b")), j).bitwiseAND(lit(1L)).cast("int"))
      .reduce(_ + _)
    a.join(b, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Exact n-gram Jaccard between pairs sharing a blocking key
    * (token-count bucket): verify-only-candidates with exact sets.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val norm = lower(regexp_replace(col(textCol), "\\s+", " "))
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k))))
    val base = df.select(col(idCol).as("id"), sh.as("sh"),
      floor(size(split(col(textCol), " ")) / 10).cast("int").as("bucket"))
    val a = base.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Exact dedup survivors (keep lowest id per content hash) —
    * shuffles only (hash, id).
    */
  def exactSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(col(textCol)).as("h"))
      .groupBy("h").agg(min("id").as("keeper_id"), count(lit(1)).as("copies"))
      .select("keeper_id", "copies")

  /** Embedding near-dup: sign-bit LSH buckets, cosine-verified pairs. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12, threshold: Double = 0.9): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.signBits(col(vecCol), planes).as("bucket"))
    val a = base.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = base.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
