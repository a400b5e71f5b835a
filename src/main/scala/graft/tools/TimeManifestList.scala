package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices two-level manifest planning against the flat single-level scan
  * at synthetic file counts (the 10k / 100k points TimeIndexPlan priced
  * for the bloom sidecar): replicate the real tip manifest's rows with
  * distinct paths across replicated month ranges, build the grouped
  * layout + list, then time (a) the FLAT plan — filter the whole
  * file-grain manifest — and (b) the TWO-LEVEL plan — read the list,
  * open only range-intersecting groups — for a fixed one-year window.
  * The point: (a) grows linearly with total file count, (b) stays flat
  * (list rows = groups, entries read = the window's).
  */
object TimeManifestList {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(120)
    // synthetic flat manifest: the real tip's ~83 month-files × reps,
    // each replica shifted to its own disjoint month range so grouping
    // has real ranges to prune
    val real = {
      val meta = graft.operators.PipelineOps.snapshotMetaDir(s, d)
      val tip = s.read.parquet(s"$meta/snapshots")
        .agg(max($"snap_id")).as[Long].head()
      s.read.parquet(s"$meta/manifests").filter($"snap_id" === tip)
        .select($"file").as[String].collect()
    }
    val monthRe = "ship_month=([0-9]{4}-[0-9]{2})".r
    val rows = (0 until reps).flatMap { r =>
      real.map { f =>
        val m = monthRe.findFirstMatchIn(f).get.group(1)
        val Array(y, mo) = m.split("-")
        val shifted = f"${y.toInt + 10 * r}%04d-$mo"
        (shifted, s"$f#rep$r")
      }
    }
    val flatDir = java.nio.file.Files.createTempDirectory("graft_flatman")
    rows.toDF("ship_month", "file").repartition(4)
      .write.mode("overwrite").parquet(flatDir.resolve("manifests").toString)
    // two-level layout over the same rows: 12-month groups
    val months = rows.map(_._1).distinct.sorted
    val groupOf = months.zipWithIndex.map { case (m, i) =>
      m -> (i / graft.operators.PipelineOps.ManifestGroupMonths).toLong
    }.toMap
    val twoDir = java.nio.file.Files.createTempDirectory("graft_twoman")
    // ONE partitioned write for all groups (thousands of groups at the
    // 100k point — a per-group write loop would dominate the build)
    rows.map { case (m, f) => (groupOf(m), m, f) }
      .toDF("group", "ship_month", "file")
      .repartition(col("group"))
      .write.mode("overwrite").partitionBy("group")
      .parquet(twoDir.resolve("manifest").toString)
    rows.groupBy(t => groupOf(t._1)).map { case (g, rs) =>
      (g, rs.length.toLong, rs.map(_._1).min, rs.map(_._1).max)
    }.toSeq.toDF("group_id", "n_files", "min_month", "max_month")
      .coalesce(1)
      .write.mode("overwrite").parquet(twoDir.resolve("manifest_list").toString)
    val n = rows.length
    val (lo, hi) = ("1995-01", "1995-12") // one real year, first replica
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val flat = s.read.parquet(flatDir.resolve("manifests").toString)
        .filter($"ship_month" >= lo && $"ship_month" <= hi)
        .select($"file").as[String].collect()
      val tFlat = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val list = s.read.parquet(twoDir.resolve("manifest_list").toString)
        .as[(Long, Long, String, String)].collect()
      val hit = list.filter(g => g._4 >= lo && g._3 <= hi).map(_._1)
      val planned = hit.flatMap { g =>
        s.read.parquet(twoDir.resolve(s"manifest/group=$g").toString)
          .filter($"ship_month" >= lo && $"ship_month" <= hi)
          .select($"file").as[String].collect()
      }
      val tTwo = (System.nanoTime() - t1) / 1e9
      require(planned.toSet == flat.toSet, "plans diverge")
      println(f"[timemanlist] run$i: files=$n groups=${list.length} " +
        f"opened=${hit.length} matched=${flat.length} " +
        f"flat=$tFlat%.3fs twolevel=$tTwo%.3fs")
    }
    s.stop()
  }
}
