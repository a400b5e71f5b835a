package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted plans for plan-quality review (pushdown, pruning,
  * broadcast choices). Not part of the library surface.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"=== $name ===")
      graft.SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
