package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of selected SparkEntry
  * queries (the `.explain` evidence the README's plan section quotes).
  * Usage: runMain graft.tools.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_zip_join", "q_batch", "q_ann_lsh", "q_embed_neardup", "q_eval_map")
    for (n <- names) {
      println(s"\n========== $n ==========")
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
