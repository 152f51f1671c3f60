package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: dump executed plans of selected queries for plan review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"========== $name ==========")
      println(graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
