package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the training-data operators: dedup family, similarity
  * search, text stats, multimodal plumbing.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsWithDups = {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    d.unionByName(d.withColumn("doc_id", col("doc_id") + 10000))
  }

  test("minhash LSH finds every exact duplicate with jaccard 1.0") {
    val pairs = Dedup.minhashLshExactPairs(docsWithDups, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.filter(p => p._2 == p._1 + 10000)
    assert(exact.length == 100, s"expected 100 exact-dup pairs, got ${exact.length}")
    assert(exact.forall(_._3 == 1.0))
  }

  test("minhash LSH output equals brute-force at threshold 0.95") {
    import spark.implicits._
    val d = docsWithDups
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val sh = array_distinct(transform(sequence(lit(1), greatest(length(norm) - 2, lit(1))),
      i => norm.substr(i, lit(3))))
    val base = d.select(col("doc_id").as("id"), sh.as("sh"))
    val brute = base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
         size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .filter(col("j") >= 0.95)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val lsh = Dedup.minhashLshExactPairs(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(lsh == brute)
  }

  test("simhash identical texts collide, hamming 0") {
    assert(Dedup.simhash64("the quick brown fox") == Dedup.simhash64("the quick brown fox"))
    assert(Dedup.simhash64("THE Quick BROWN fox") == Dedup.simhash64("the quick brown fox"))
    assert(Dedup.simhash64("alpha beta gamma") != Dedup.simhash64("delta epsilon zeta"))
  }

  test("simhashPairs finds exact copies at hamming 0") {
    val pairs = Dedup.simhashPairs(docsWithDups, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (0L until 100L).map(i => (i, i + 10000))
    assert(expected.forall(pairs.contains))
  }

  test("exact survivors keep lowest id") {
    val out = Dedup.exactSurvivors(docsWithDups, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 100)
    assert(out.forall { case (keeper, copies) => keeper < 10000 && copies == 2 })
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")

  test("brute-force top-k: self excluded, ranks contiguous, cos descending") {
    val rows = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3)
      .collect()
    assert(rows.length == 15)
    val byQuery = rows.groupBy(_.getLong(0))
    for ((q, rs) <- byQuery) {
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toList == List(1, 2, 3))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(_.getLong(2) == q))
    }
  }

  test("LSH top-k candidates are a subset of brute-force ordering within bucket") {
    val lsh = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3)
      .collect()
    // structural checks: ranks contiguous from 1 per query, cos within [-1,1]
    for ((_, rs) <- lsh.groupBy(_.getLong(0))) {
      assert(rs.map(_.getInt(1)).sorted.toList == (1 to rs.length).toList)
      assert(rs.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    }
  }

  test("xxhash64 matches Spark's builtin (shared seed path)") {
    import spark.implicits._
    val strings = Seq("", "a", "hello world", "Zürich ünïcode", "x" * 100)
    val fromSpark = strings.toDF("s").select(xxhash64(col("s"))).collect().map(_.getLong(0))
    val local = strings.map(s => XxHash.hashUtf8(s, 42L)) // Spark's default seed is 42
    assert(fromSpark.toSeq == local)
  }
}

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("marker counting is replace-based, non-overlapping") {
    import spark.implicits._
    val df = Seq("the cat the dog", "a the a", "nothing here", "the the the").toDF("text")
    val counts = df.select(TextStats.markerCount(col("text"), " the ").as("c"))
      .collect().map(_.getDouble(0))
    // ' the the the ' → replace(' the ') removes non-overlapping LTR:
    // ' the the the ' = ' ' + 'the the the' + ' ' → occurrences at 0 ('. the .')…
    assert(counts(0) == 2.0)
    assert(counts(2) == 0.0)
  }

  test("langId deterministic and marker-driven") {
    import spark.implicits._
    val df = Seq(
      "the quick fox jumps over a fence",
      "der hund und die katze",
      "el perro y la casa",
      "xyzzy plugh").toDF("text")
    val langs = df.select(TextStats.langId(col("text"))).collect().map(_.getString(0))
    assert(langs.toList == List("en", "de", "es", "und"))
  }

  test("rolling fingerprint deterministic, order-sensitive") {
    val a = TextStats.rollingFingerprint(Seq("alpha", "beta"))
    assert(a == TextStats.rollingFingerprint(Seq("alpha", "beta")))
    assert(a != TextStats.rollingFingerprint(Seq("beta", "alpha")))
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary metadata decode is deterministic and schema-typed") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").limit(20)
    val metas = Multimodal.decodeMeta(Multimodal.withBinary(d, "text"), "doc_id").collect()
    assert(metas.length == 20)
    assert(metas.forall(m => m.width == 1 + m.n_bytes % 64 && m.height == 1 + m.n_bytes % 48))
    val again = Multimodal.decodeMeta(Multimodal.withBinary(d, "text"), "doc_id").collect()
    assert(metas.sortBy(_.id).toList == again.sortBy(_.id).toList)
  }

  test("frame sampling explodes deterministically with stride") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").limit(5)
    val frames = Multimodal.sampleFrames(Multimodal.withBinary(d, "text"), "doc_id")
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 4 == 0)) // stride 4
  }
}
