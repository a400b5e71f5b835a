package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the dedup_ngram_jaccard pipeline
  * (r16 driver-bench adjudication) — which stage owns the cold cost.
  */
object TimeJac {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[timejac] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // stage A: corpus + fused shingling (the typed mapPartitions pass)
    val corpus = graft.operators.Dedup.corpus(s, d)
    val sh = corpus.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, graft.operators.Dedup.shingleArrayJvm(t)) })
      .toDF("doc_id", "ts")
      .select($"doc_id", explode($"ts").as("t"))
      .select($"doc_id", xxhash64($"t").as("h"))
    time("A shingle rows")(println("  rows=" + sh.count()))
    time("A again (warm)")(println("  rows=" + sh.count()))

    // stage B: the bounded-collect df-cap aggregate
    val bounded = udaf(new graft.functions.BoundedCollectAgg(512))
    val capped = sh.groupBy($"h").agg(bounded($"doc_id").as("ids"))
      .filter($"ids".isNotNull).select($"ids")
    time("B capped groups")(println("  groups=" + capped.count()))
    time("B again (warm)")(println("  groups=" + capped.count()))

    // stage C: the full query, twice (second hits the plan cache)
    for (i <- 1 to 2)
      time(s"C full query run$i")(println("  rows=" +
        graft.SparkEntry.queries("dedup_ngram_jaccard")(s, d).count()))
    s.stop()
  }
}
