package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: price the driver-side bloom-index planning collect
  * (matchedFilesInIndex) at a synthetic file count far beyond the driver
  * SFs — the manifest-scale claim as a measured number (VERDICT r12 #8).
  * Replicates the real sf-dir sidecar rows N-fold under distinct paths,
  * then times the probe (metadata read + bloom probe + file-name collect).
  */
object TimeIndexPlan {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(120) // 83 files × 120 ≈ 10k
    // force the real index, then replicate its rows with distinct paths
    val (_, nReal) = PipelineOps.bloomIdxMatchedFiles(s, d)
    val idxPath = java.nio.file.Files.createTempDirectory("graft_synthidx").toString
    val realIdx = PipelineOps.bloomIdxDataDir(s, d).stripSuffix("/data") + "/index"
    val real = s.read.parquet(realIdx)
    real.crossJoin(spark_range(s, reps))
      .withColumn("file", concat($"file", lit("#"), $"rep"))
      .drop("rep")
      .write.mode("overwrite").parquet(idxPath)
    val n = s.read.parquet(idxPath).count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val (m, tot) = PipelineOps.matchedFilesInIndex(s, idxPath,
        PipelineOps.BloomIdxKeys.toDF("k"))
      println(f"[timeidx] run$i: files=$tot matched=${m.length} " +
        f"plan=${(System.nanoTime() - t0) / 1e9}%.3fs (real files=$nReal)")
    }
    s.stop()
  }
  private def spark_range(s: SparkSession, reps: Int) =
    s.range(reps).select(col("id").as("rep"))
}
