package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: time several named queries (cache-cleared, warm JIT).
  *
  * Timing action is `.count()` — deliberately the SAME action Bench.scala
  * uses, so numbers here are comparable to BENCH_*.json cells. Caveat for
  * both: count() lets Catalyst drop a final orderBy and prune unreferenced
  * projection columns, so it understates full-materialization cost (the
  * Verify parquet write is the materializing path); since every round's
  * bench pays the identical discount, cross-round ratios are unaffected. */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      spark.sharedState.cacheManager.clearCache()
      println(f"TIMED $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
