package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: per-verb SQL DML latency against a cloned catalog at the
  * given scale — prices the chained-commit metadata model (commit
  * metadata O(live files), never O(files × history)).
  */
object TimeDml {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    // clone the shared catalog fixture: DML must not mutate it
    val root = graft.Fixtures.tempDir("graft_dmlbench")
    s.read.parquet(
        s"${graft.operators.PipelineOps.catalogDir(s, d)}/catalog_log")
      .coalesce(1).write.parquet(root.resolve("catalog_log").toString)
    s.conf.set("spark.sql.catalog.dml_bench",
      classOf[graft.sources.lake.GraftLakeCatalog].getName)
    s.conf.set("spark.sql.catalog.dml_bench.catalogDir", root.toString)

    def time(label: String)(q: String): Unit = {
      val t0 = System.nanoTime()
      s.sql(q).collect()
      println(f"[timedml] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("warm count")("SELECT count(*) FROM dml_bench.ship_fact")
    time("INSERT INTO (2 rows)")(
      "INSERT INTO dml_bench.ship_fact VALUES " +
        "(9100000001, 11, 2, 350, DATE'1999-01-05', '1999-01')," +
        "(9100000002, 12, 3, 475, DATE'1999-02-07', '1999-02')")
    time("DELETE (key fast path)")(
      "DELETE FROM dml_bench.ship_fact WHERE l_orderkey IN (7, 212)")
    time("UPDATE (CoW one order)")(
      "UPDATE dml_bench.ship_fact SET qty = qty + 1 WHERE l_orderkey = 994")
    Seq((388L, 7L), (9100000777L, 4L)).toDF("k", "dq")
      .createOrReplaceTempView("dml_src")
    time("MERGE INTO (1 matched + 1 insert)")(
      """MERGE INTO dml_bench.ship_fact t USING dml_src s
        |ON t.l_orderkey = s.k
        |WHEN MATCHED THEN UPDATE SET qty = t.qty + s.dq
        |WHEN NOT MATCHED THEN INSERT
        |  (l_orderkey, l_partkey, qty, net_cents, ship_day, ship_month)
        |  VALUES (s.k, 1, s.dq, 555, DATE'1999-05-01', '1999-05')""".stripMargin)
    time("post-DML count")("SELECT count(*) FROM dml_bench.ship_fact")
    time("post-DML count again")("SELECT count(*) FROM dml_bench.ship_fact")
    s.stop()
  }
}
