package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Final dedup-metrics row (reference A2/A3: `ae.rs:91`). */
case class DedupMetrics(
    unique_bytes: Long,
    total_bytes: Long,
    distinct_chunks: Long,
    chunk_count: Long,
    dedup_coeff: Double,
    avg_chunk_size: Double)

/** Single-pass typed aggregate computing the reference's dedup metrics from
  * `(hash, length)` chunk rows — the in-memory `HashSet<u64>` loop
  * (`ae.rs:68-88`) as a Catalyst `Aggregator` with partial+final merge:
  * partitions build local seen-maps, Spark merges them, one pass total
  * (versus the two aggregations of `Chunking.dedupMetrics`).
  *
  * Scale contract: the buffer holds one entry per DISTINCT hash in its
  * scope, so use it where distinct cardinality is bounded (per-document /
  * per-group scopes, `groupByKey(...).agg(DedupMetricsAgg.toColumn)`). For
  * corpus-wide metrics at 100 TB keep the relational two-step
  * (`groupBy(hash)` scales out across the cluster; a single merged map does
  * not) — this mirrors the reference's own limitation, which holds the whole
  * set on one machine.
  */
object DedupMetricsAgg extends Aggregator[(Long, Long), mutable.HashMap[Long, Long], DedupMetrics] {

  override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty[Long, Long]

  // totals are carried as two reserved entries updated on every reduce; the
  // probability of xxhash64 emitting the reserved sentinels is ~2^-63 and
  // they are excluded from distinct counting.
  private val TotalBytesKey = Long.MinValue
  private val TotalCountKey = Long.MinValue + 1

  override def reduce(b: mutable.HashMap[Long, Long], a: (Long, Long)): mutable.HashMap[Long, Long] = {
    val (hash, len) = a
    b.getOrElseUpdate(hash, len)
    b(TotalBytesKey) = b.getOrElse(TotalBytesKey, 0L) + len
    b(TotalCountKey) = b.getOrElse(TotalCountKey, 0L) + 1L
    b
  }

  override def merge(b1: mutable.HashMap[Long, Long], b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreachEntry { (k, v) =>
      if (k == TotalBytesKey || k == TotalCountKey)
        big(k) = big.getOrElse(k, 0L) + v
      else big.getOrElseUpdate(k, v)
    }
    big
  }

  override def finish(b: mutable.HashMap[Long, Long]): DedupMetrics = {
    val totalBytes = b.getOrElse(TotalBytesKey, 0L)
    val totalCount = b.getOrElse(TotalCountKey, 0L)
    var uniqueBytes = 0L
    var distinct = 0L
    b.foreachEntry { (k, v) =>
      if (k != TotalBytesKey && k != TotalCountKey) { uniqueBytes += v; distinct += 1 }
    }
    // Mirrors Portable.round's double-rounding (8 decimals, then n) so
    // one-pass and two-step metrics agree bit-for-bit.
    def r(x: Double, n: Int): Double =
      BigDecimal.decimal(
        BigDecimal.decimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
        .setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    DedupMetrics(
      uniqueBytes, totalBytes, distinct, totalCount,
      if (totalBytes == 0) 0.0 else r(uniqueBytes.toDouble / totalBytes, 6),
      if (distinct == 0) 0.0 else r(totalBytes.toDouble / distinct, 2))
  }

  override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] = Encoders.kryo
  override def outputEncoder: Encoder[DedupMetrics] = Encoders.product[DedupMetrics]

  /** Typed column for `Dataset[(hash, length)].select(...)` or grouped agg. */
  def column: TypedColumn[(Long, Long), DedupMetrics] = toColumn.name("metrics")
}

/** Same aggregate over `(key, hash, length)` rows for
  * `groupByKey(_.key).agg(...)` usage — the bounded per-group scope the
  * buffer contract asks for.
  */
object DedupMetricsAggKeyed extends Aggregator[(Long, Long, Long), mutable.HashMap[Long, Long], DedupMetrics] {
  override def zero: mutable.HashMap[Long, Long] = DedupMetricsAgg.zero
  override def reduce(b: mutable.HashMap[Long, Long], a: (Long, Long, Long)): mutable.HashMap[Long, Long] =
    DedupMetricsAgg.reduce(b, (a._2, a._3))
  override def merge(b1: mutable.HashMap[Long, Long], b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] =
    DedupMetricsAgg.merge(b1, b2)
  override def finish(b: mutable.HashMap[Long, Long]): DedupMetrics = DedupMetricsAgg.finish(b)
  override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] = Encoders.kryo
  override def outputEncoder: Encoder[DedupMetrics] = Encoders.product[DedupMetrics]
  def column: TypedColumn[(Long, Long, Long), DedupMetrics] = toColumn.name("metrics")
}
