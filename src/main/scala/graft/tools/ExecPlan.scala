package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: run a query and dump the EXECUTED plan (post-AQE), where
  * columnar transitions are visible.
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.collect()
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
