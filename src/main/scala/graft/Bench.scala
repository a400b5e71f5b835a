package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Each query runs twice: a warmup pass (whole-stage codegen compilation +
  * JVM JIT dominate cold runs — 5-7s of janino/C2 time on a 0.8s query),
  * then the measured pass. The cache manager is cleared between the two so
  * queries that cache intermediates are measured doing their real work, not
  * reading the warmup's cache.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warmup
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val mbps = chunkerThroughput()
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"chunker_mbps":$mbps,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Raw single-thread chunker throughput (MB/s) on 64 MiB of deterministic
    * pseudorandom bytes, 16 KiB expected chunks — the reference experiment's
    * workload shape (`main.rs:16-24`) measured at the core, below Spark.
    */
  private def chunkerThroughput(): Map[String, Double] = {
    val data = new Array[Byte](64 << 20)
    new java.util.Random(42L).nextBytes(data)
    Seq("fixed", "ae", "fastcdc", "rabin").map { algo =>
      val c = core.Chunker(algo, 16 * 1024, 42L)
      c.boundaries(data) // warmup (JIT)
      val t0 = System.nanoTime()
      val n = c.boundaries(data).length
      val secs = (System.nanoTime() - t0) / 1e9
      require(n > 0)
      algo -> math.round(data.length / 1e6 / secs * 10) / 10.0
    }.toMap
  }
}
