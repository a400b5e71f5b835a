package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: phase breakdown of the time-travel/branch readout cells —
  * metadata collects vs scan+agg vs plan time. Delete after the round.
  */
object TimeTT {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    // build fixtures + warm JIT
    graft.SparkEntry.queries("pipeline_snapshot_branch")(spark, d).count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tt] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val refs = t("currentRefs (refs_log collect)") {
        PipelineOps.currentRefs(spark, d)
      }
      refs.foreach { case (ref, _, id) =>
        val df = t(s"readBranchSnapshot($id) construct (manifest collect + plan)") {
          PipelineOps.readBranchSnapshot(spark, d, id)
        }
        t(s"agg($ref)") {
          df.agg(count(lit(1)), countDistinct($"l_orderkey"),
            sum($"qty"), sum($"net_cents")).collect()
        }
      }
    }
    // how much of the scan job is the countDistinct vs plain agg?
    val refs = PipelineOps.currentRefs(spark, d)
    val df = PipelineOps.readBranchSnapshot(spark, d, refs.head._3)
    t("plain count only") { df.count() }
    t("agg w/o countDistinct") { df.agg(count(lit(1)), sum($"qty")).collect() }
    t("agg with countDistinct") {
      df.agg(count(lit(1)), countDistinct($"l_orderkey"), sum($"qty")).collect()
    }
    spark.stop()
  }
}
