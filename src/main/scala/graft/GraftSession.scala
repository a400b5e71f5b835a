package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** Library entry point: a SparkSession wired for this engine.
  *
  * Applies the recommended scale configuration — AQE with skew-join handling
  * on, shuffle parallelism matched to cores (the right default for local
  * mode; on a cluster pass the target partition count explicitly) — and
  * registers the engine's SQL surface (`cdc_chunks`). Everything is a plain
  * SparkSession: `GraftSession.get()` composes with existing code.
  */
object GraftSession {

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      master match {
        case GraftSession.LocalN(n) => n.toInt
        case _ => 200
      })
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Manifest-addressed snapshot reads pass explicit leaf-file paths;
      // statting up to 512 of them on the driver beats scheduling a
      // distributed listing job (see Bench.scala for the rationale).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
  }

  /** Build (or reuse) the session and ensure the SQL functions are
    * registered even when an existing session is returned.
    */
  def get(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    GraftExtensions.register(s)
    s
  }

  private val LocalN = """local\[(\d+)\]""".r
}
