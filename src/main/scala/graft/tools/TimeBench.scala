package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: bench-identical measurement (warmup + N passes with cache
  * cleared before each) for named queries.
  */
object TimeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (name <- args.drop(1)) {
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, d).count() catch { case _: Throwable => () } // warmup
      val ts = (1 to 5).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timebench] $name passes=${ts.map(t => f"$t%.2f").mkString(",")} median=${ts.sorted.apply(2)}%.2f")
    }
    spark.stop()
  }
}
