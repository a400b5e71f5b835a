package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.AeChunker

/** Direct coverage of the two segment-parallel native expressions
  * (ChunkingSpec pins their end-to-end equality to the core ground truth;
  * this spec pins the SQL surface, argument validation, and the emission
  * contract of each expression in isolation).
  */
class CdcSegmentedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .appName("CdcSegmentedSpec")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  private def bytes(n: Int, seed: Long): Array[Byte] = {
    val a = new Array[Byte](n)
    new scala.util.Random(seed).nextBytes(a)
    a
  }

  test("cdc_segment_bounds from SQL equals the core boundsInRange per segment") {
    import spark.implicits._
    val data = bytes(100000, 5)
    Seq((1L, data)).toDF("id", "payload").createOrReplaceTempView("seg_v")
    val got = spark.sql(
      """SELECT seg, cdc_segment_bounds(payload, 'ae', 8192, 0, seg, 4) AS cuts
        |FROM seg_v LATERAL VIEW explode(sequence(0, 3)) AS seg""".stripMargin)
      .as[(Int, Array[Int])].collect().sortBy(_._1)
    val c = AeChunker(8192)
    for ((seg, cuts) <- got) {
      val left = seg * data.length / 4
      val right = (seg + 1) * data.length / 4
      assert(cuts.toSeq == c.boundsInRange(data, left, right).toSeq, s"segment $seg")
    }
  }

  test("cdc_slice_chunks emits locally-distinct interiors plus exactly one edge per slice") {
    import spark.implicits._
    val data = bytes(40000, 9)
    Seq((1L, data)).toDF("id", "payload").createOrReplaceTempView("slice_v")
    val rows = spark.sql(
      """SELECT p, c.hash, c.length, c.edge, c.is_edge
        |FROM slice_v LATERAL VIEW explode(sequence(0, 3)) AS p
        |LATERAL VIEW cdc_slice_chunks(payload, 'fastcdc', 1024, 7, p, 4) c""".stripMargin)
      .as[(Int, Long, Int, Array[Byte], Boolean)].collect()
    for (p <- 0 to 3) {
      val (edges, interiors) = rows.filter(_._1 == p).partition(_._5)
      assert(edges.length == 1, s"slice $p must hold back exactly one edge chunk")
      val (_, _, el, eb, _) = edges.head
      assert(eb != null && eb.length == el, s"slice $p edge bytes/length disagree")
      // reconstruct the slice and check the edge is its last (even p) or
      // first (odd p) core chunk
      val slice = java.util.Arrays.copyOfRange(data, p * data.length / 4, (p + 1) * data.length / 4)
      val cs = graft.core.Chunker("fastcdc", 1024, 7L).chunks(slice)
      val (eo, elCore) = if (p % 2 == 0) cs.last else cs.head
      assert(java.util.Arrays.equals(eb, java.util.Arrays.copyOfRange(slice, eo, eo + elCore)))
      // interiors: distinct hashes, no edge bytes carried, count equal to
      // the number of locally-distinct interior chunk contents
      assert(interiors.map(_._2).distinct.length == interiors.length,
        s"slice $p interiors must be locally deduped")
      assert(interiors.forall(_._4 == null), s"slice $p interior rows must not carry bytes")
      val (lo, hi) = if (p % 2 == 0) (0, cs.length - 1) else (1, cs.length)
      val expectDistinct = (lo until hi)
        .map { i => val (off, len) = cs(i); slice.slice(off, off + len).toSeq }
        .distinct.size
      assert(interiors.length == expectDistinct, s"slice $p interior count")
    }
  }

  test("both expressions reject non-constant config and non-binary payload") {
    import spark.implicits._
    Seq(("x", 1)).toDF("s", "n").createOrReplaceTempView("segbad_v")
    for (fn <- Seq("cdc_segment_bounds", "cdc_slice_chunks")) {
      val e1 = intercept[Exception](spark.sql(
        s"SELECT $fn(encode(s,'utf-8'), 'ae', 8192, 0, 0, n) FROM segbad_v").collect())
      assert(e1.getMessage.toLowerCase.contains("constant"), fn)
      val e2 = intercept[Exception](spark.sql(
        s"SELECT $fn(s, 'ae', 8192, 0, 0, 4) FROM segbad_v").collect())
      assert(e2.getMessage.toLowerCase.contains("binary"), fn)
    }
  }
}
