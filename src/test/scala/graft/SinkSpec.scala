package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Serializers

/** Sharded training-data export: deterministic shard assignment,
  * manifest integrity, and the refuse-partial-data load guard.
  */
class SinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("writeShardedJsonl: manifest matches data, assignment is deterministic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    try {
      val docs = (0L until 300L).map(i => (i, s"document number $i"))
        .toDF("doc_id", "text")
      val manifest = Serializers.writeShardedJsonl(docs, "doc_id", dir, 5)
      assert(manifest.map(_._2).sum == 300L)
      assert(manifest.forall { case (_, rows, bytes) =>
        (rows == 0) == (bytes == 0) })
      // verified round-trip (byte gate + the optional recount gate):
      // all rows come back
      Serializers.readShardedJsonl(spark, dir, schema, recount = true).count()
      val back = Serializers.readShardedJsonl(spark, dir, schema)
      assert(back.count() == 300L)
      assert(back.select("doc_id", "text").as[(Long, String)].collect().toSet ==
        (0L until 300L).map(i => (i, s"document number $i")).toSet)
      // the on-disk placement IS pmod(xxhash64(doc_id), 5) — recompute
      // independently and compare to the partition column
      val misplaced = back
        .withColumn("expect", pmod(xxhash64(col("doc_id")), lit(5)).cast("int"))
        .filter(col("shard") =!= col("expect")).count()
      assert(misplaced == 0L)
      // a second write of the same data shards identically (manifest
      // rows equal per shard)
      val dir2 = java.nio.file.Files.createTempDirectory("graft_sink2").toString
      try {
        val manifest2 = Serializers.writeShardedJsonl(docs, "doc_id", dir2, 5)
        assert(manifest2.map(e => (e._1, e._2)) ==
          manifest.map(e => (e._1, e._2)))
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir2))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("md5 shard key places by the md5-prefix idiom; unknown keys are rejected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_md5").toString
    try {
      val docs = (0L until 120L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val manifest = Serializers.writeShardedJsonl(docs, "doc_id", dir, 5, shardBy = "md5")
      assert(manifest.map(_._2).sum == 120L)
      val back = Serializers.readShardedJsonl(spark, dir, schema)
      // placement IS conv(substr(md5(id-as-string),1,8),16,10) % 5 —
      // the DuckDB-twinnable arithmetic q_shard_manifest oracles
      val misplaced = back
        .withColumn("expect",
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(5)).cast("int"))
        .filter(col("shard") =!= col("expect")).count()
      assert(misplaced == 0L)
      intercept[IllegalArgumentException] {
        Serializers.writeShardedJsonl(docs, "doc_id", dir, 5, shardBy = "sha1")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("writeShardedJsonl on an empty input writes an all-zero manifest, and it loads back") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_empty").toString
    try {
      // an empty DataFrame writes no shard=* directories at all — the
      // count pass must not glob a non-existent path and throw
      val manifest = Serializers.writeShardedJsonl(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", dir, 4)
      assert(manifest == (0 until 4).map(s => (s, 0L, 0L)))
      assert(Serializers.readShardedJsonl(spark, dir, schema).count() == 0L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("readShardedJsonl refuses partial data and missing manifests") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink3").toString
    try {
      val docs = (0L until 120L).map(i => (i, s"d $i")).toDF("doc_id", "text")
      Serializers.writeShardedJsonl(docs, "doc_id", dir, 4)
      // an input that already carries a 'shard' column is rejected
      // instead of silently clobbered
      intercept[IllegalArgumentException] {
        Serializers.writeShardedJsonl(
          docs.withColumn("shard", lit(0)), "doc_id", dir + "_x", 4)
      }
      // truncate a part file IN PLACE → byte gate refuses (a PERMISSIVE
      // row count would still see a row for the torn line)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      val part = shardDirs.head.listFiles()
        .filter(_.getName.startsWith("part-")).head
      val raw = java.nio.file.Files.readAllBytes(part.toPath)
      java.nio.file.Files.write(part.toPath,
        java.util.Arrays.copyOf(raw, raw.length - 3))
      val t = intercept[IllegalStateException] {
        Serializers.readShardedJsonl(spark, dir, schema)
      }
      assert(t.getMessage.contains("refusing"))
      java.nio.file.Files.write(part.toPath, raw) // restore
      Serializers.readShardedJsonl(spark, dir, schema) // green again
      // drop one whole shard directory → load must fail loud
      org.apache.commons.io.FileUtils.deleteDirectory(shardDirs.last)
      val e = intercept[IllegalStateException] {
        Serializers.readShardedJsonl(spark, dir, schema).count()
      }
      assert(e.getMessage.contains("refusing"))
      // no manifest at all → refused up front
      val bare = java.nio.file.Files.createTempDirectory("graft_sink4").toString
      try intercept[IllegalArgumentException] {
        Serializers.readShardedJsonl(spark, bare, schema)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(bare))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
