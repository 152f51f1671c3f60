package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Extract

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val turnsDir = args(0)
    val cores = args(1).toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(name: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); f
        println(f"[profile] $name run$i ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    if (!new java.io.File(turnsDir).exists()) {
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .crossJoin(spark.range(600).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", col("doc_id") * 600 + col("rep")).drop("rep")
        .createOrReplaceTempView("documents")
      spark.sql(graft.sources.Turns.CoreSql)
        .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("doc_id")))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .write.parquet(turnsDir)
    }
    val turns = spark.read.parquet(turnsDir).as[graft.model.Turn]
    val sample = turns.limit(20000).collect()
    for (round <- 1 to 3) {
      val t1 = System.nanoTime()
      var i = 0; var acc = 0L
      while (i < sample.length) { acc += Extract.extractTurn(sample(i)).words.length; i += 1 }
      val st = (System.nanoTime()-t1)/1e9
      println(f"[profile] kernel_1thread round$round ${st}%.3f s (${st*1e6/sample.length}%.1f us/turn, acc=$acc)")
    }
    for (round <- 1 to 3) {
      val t2 = System.nanoTime()
      val chunks = sample.grouped(sample.length/32+1).toArray
      val accs = new java.util.concurrent.atomic.AtomicLong()
      val threads = chunks.map(chunk => new Thread(() => {
        var a = 0L; chunk.foreach(t => a += Extract.extractTurn(t).words.length); accs.addAndGet(a)
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      val n2 = accs.get()
      val pt = (System.nanoTime()-t2)/1e9
      println(f"[profile] kernel_32thread round$round ${pt}%.3f s (n=$n2)")
    }
    for (nt <- Seq(1, 2, 4, 8, 16, 32); round <- 1 to 3) {
      val t3 = System.nanoTime()
      val reps = 4 // fixed total work: each thread does sample/nt turns, 4 sweeps
      val chunkSize = sample.length / nt + 1
      val threads = (0 until nt).map { k =>
        new Thread(() => {
          var rr = 0
          while (rr < reps) {
            var i = k * chunkSize
            val end = math.min(i + chunkSize, sample.length)
            while (i < end) { Extract.extractTurn(sample(i)); i += 1 }
            rr += 1
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val sec = (System.nanoTime()-t3)/1e9
      println(f"[profile] threads=$nt round$round sec=$sec%.3f rate=${sample.length*reps/sec/1000}%.1f k/s percore=${sample.length*reps/sec/nt}%.0f /s")
    }
    spark.stop()
  }
}
