package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time one named query (warm second run), print its plan. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count()
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"TIMED $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
