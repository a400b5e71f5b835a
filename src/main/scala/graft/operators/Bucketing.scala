package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location: pre-shuffle a fact table ONCE at write time so
  * every later join/aggregation on the bucket key runs exchange-free. This is
  * the 100 TB answer to "the same join key is hit by every query": at scale,
  * re-shuffling lineitem per query dwarfs the actual join work.
  *
  * Usage shape (verified exchange-free in BucketingSpec):
  * {{{
  *   Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 256)
  *   Bucketing.writeBucketed(orders,   "orders_b",   "o_orderkey", 256)
  *   spark.table("lineitem_b").join(spark.table("orders_b"),
  *     $"l_orderkey" === $"o_orderkey")   // SortMergeJoin, zero Exchange
  * }}}
  */
object Bucketing {

  /** Write `df` as a managed parquet table hash-bucketed (and sorted) on
    * `key`. Bucket count should divide evenly into target parallelism and
    * keep each bucket's largest partition within executor memory.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
