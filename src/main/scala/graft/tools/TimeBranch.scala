package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: decompose pipeline_cherry_pick's cost at scale. */
object TimeBranch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val P = graft.operators.PipelineOps
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tb] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    import spark.implicits._
    val meta = t("snapshotMetaDir build")(P.snapshotMetaDir(spark, d))
    val mf = spark.read.parquet(s"$meta/manifests")
    println("[tb] files per snapshot: " + mf.groupBy($"snap_id").count()
      .orderBy($"snap_id").collect().mkString(", "))
    t("readSnapshot(4).count warm1")(P.readSnapshot(spark, d, 4L).count())
    t("readSnapshot(4).count warm2")(P.readSnapshot(spark, d, 4L).count())
    t("branchMetaDir build")(P.branchMetaDir(spark, d))
    t("readBranchSnapshot(7).count 1")(P.readBranchSnapshot(spark, d, 7L).count())
    t("readBranchSnapshot(7).count 2")(P.readBranchSnapshot(spark, d, 7L).count())
    t("readBranchSnapshot(6).count")(P.readBranchSnapshot(spark, d, 6L).count())
    spark.stop()
  }
}
