package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bottom-k selection: keep the `k` input rows with the smallest
  * `(sortKey, id)` — the distributed deterministic-sampling primitive. Paired
  * with a hash sort key (md5 of a stable id) this is "a uniform k-sample of
  * the corpus, reproducible on re-runs and mergeable across partitions":
  * every partial buffer is O(k), the final merge is one tiny row, and no
  * global sort/shuffle of the full table ever happens — at 100 TB the
  * alternative window-rank formulation sorts everything to keep 100 rows.
  *
  * Buffers compact lazily: appends go unsorted into the buffer and the
  * sort+truncate to `k` runs only when it exceeds `4k`, so per-row cost is
  * amortized O(1) and compaction O(k log k). Merge-order independent because
  * bottom-k of a union is bottom-k of concatenated bottom-k's. Ties are
  * impossible when ids are distinct (the id is the tiebreak), making the
  * result exactly `ORDER BY sortKey, id LIMIT k`.
  */
final class BottomKAgg(k: Int)
    extends Aggregator[(String, Long), mutable.ArrayBuffer[(String, Long)], Array[Long]] {
  require(k > 0, "k must be positive")

  private val compactAt = 4 * k

  private def compact(b: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] =
    if (b.length <= k) b
    else {
      val arr = b.sortBy(identity).take(k)
      arr
    }

  override def zero: mutable.ArrayBuffer[(String, Long)] = mutable.ArrayBuffer.empty

  override def reduce(
      b: mutable.ArrayBuffer[(String, Long)],
      v: (String, Long)): mutable.ArrayBuffer[(String, Long)] = {
    b += v
    if (b.length > compactAt) compact(b) else b
  }

  override def merge(
      b1: mutable.ArrayBuffer[(String, Long)],
      b2: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] = {
    b1 ++= b2
    compact(b1)
  }

  override def finish(b: mutable.ArrayBuffer[(String, Long)]): Array[Long] =
    b.sortBy(identity).take(k).map(_._2).toArray

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(String, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(String, Long)]]

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
