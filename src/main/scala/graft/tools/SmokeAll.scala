package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: run EVERY SparkEntry query at a small sf, catching per-query
  * failures — the fast way to find schema-drift breakage across the whole
  * surface after a testdata regeneration (the bench's failed=N counter,
  * without the median-of-3 cost).
  */
object SmokeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, sfDir).count()
        println(s"OK   $name rows=$n")
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"FAIL $name : ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | ")}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    println(s"SMOKE failed=$bad of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
