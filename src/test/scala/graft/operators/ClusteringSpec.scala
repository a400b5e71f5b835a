package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariant contracts for the deterministic k-means and SemDeDup operators
  * (the DuckDB oracle pins outputs bit-for-bit at sf0.01; these pin the
  * semantics at spec scale and the properties the oracle can't express).
  */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("ClusteringSpec")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("kmeans assigns every vector to exactly one cluster in [0, 8)") {
    import spark.implicits._
    val n = graft.Tables.embeddings(spark, sfDir).count()
    val out = Clustering.queries("sim_kmeans_clusters")(spark, sfDir)
    val rows = out.select($"vec_id", $"cid", $"cluster_size").as[(Long, Long, Long)].collect()
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == n)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    // cluster_size is consistent: the sizes column sums to n over distinct cids
    val bySize = rows.groupBy(_._2).map { case (cid, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"inconsistent size for cid $cid")
      rs.head._3
    }
    assert(bySize.sum == n)
  }

  test("kmeans is deterministic across runs and partitionings") {
    val a = Clustering.queries("sim_kmeans_clusters")(spark, sfDir).collect().toSeq
    val b = Clustering.queries("sim_kmeans_clusters")(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("semantic dedup drops every planted exact copy, never an original's first occurrence") {
    import spark.implicits._
    val out = Clustering.queries("dedup_semantic")(spark, sfDir)
      .select($"vec_id", $"dropped").as[(Long, Boolean)].collect().toMap
    val exactCopies = out.keys.filter(id => id >= 100000 && id < 200000)
    assert(exactCopies.nonEmpty)
    // an exact copy has an identical quantized vector -> identical argmin ->
    // same cluster as its source, and cosine 1.0 to it -> always dropped
    exactCopies.foreach(id => assert(out(id), s"exact copy $id not dropped"))
    // an original doc with no smaller near-duplicate partner is never dropped:
    // originals are near-orthogonal (max pairwise cos ~0.55 < 0.85 threshold)
    out.keys.filter(_ < 100000).foreach(id => assert(!out(id), s"original $id dropped"))
  }

  test("semantic dedup drops a co-clustered near-duplicate (recall is clustering-bounded)") {
    import spark.implicits._
    val out = Clustering.queries("dedup_semantic")(spark, sfDir)
      .select($"vec_id", $"dropped").as[(Long, Boolean)].collect().toMap
    val near = out.keys.filter(_ >= 200000)
    assert(near.nonEmpty)
    // not all near-dups co-cluster with their source, but a majority should
    val droppedFrac = near.count(out(_)).toDouble / near.size
    assert(droppedFrac >= 0.5, s"near-dup drop fraction $droppedFrac")
  }
}
