package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Size-bounded `collect_list` for "collect the group unless it is too big
  * to care about": buffers at most `cap + 1` elements, and any group that
  * overflows the cap finishes as NULL (callers drop it with `isNotNull`).
  *
  * Semantically identical to `collect_list(x)` followed by
  * `filter(size(ids) <= cap)` whenever downstream treats the list as a SET
  * (order-insensitive) — but the aggregation buffer is O(cap) instead of
  * O(group size): a corpus-wide stop-shingle shared by 10⁶ documents costs
  * 513 longs of state, not an 8 MB array built only to be filtered away.
  * That is the difference between the inverted-index aggregation surviving
  * a 100 TB corpus and it OOMing on hot keys before the df-cut can apply.
  *
  * Merge-safe: overflow is encoded as length `cap + 1`, so partial buffers
  * combine by appending only up to that sentinel length — once any
  * combination of partials exceeds the cap the group stays overflowed
  * regardless of merge order.
  */
final class BoundedCollectAgg(cap: Int)
    extends Aggregator[Long, mutable.ArrayBuffer[Long], Array[Long]] {
  require(cap > 0, "cap must be positive")

  override def zero: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty

  override def reduce(b: mutable.ArrayBuffer[Long], v: Long): mutable.ArrayBuffer[Long] = {
    if (b.length <= cap) b += v // length cap+1 = overflow sentinel; stop storing
    b
  }

  override def merge(
      b1: mutable.ArrayBuffer[Long],
      b2: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val need = math.min(cap + 1 - b1.length, b2.length)
    var i = 0
    while (i < need) { b1 += b2(i); i += 1 }
    b1
  }

  override def finish(b: mutable.ArrayBuffer[Long]): Array[Long] =
    if (b.length > cap) null else b.toArray

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Long]] =
    Encoders.kryo[mutable.ArrayBuffer[Long]]

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
