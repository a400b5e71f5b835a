package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a mergeable typed aggregate: at most
  * `k` counters survive in any buffer, so the state is O(k) no matter how
  * many items stream through — the 100 TB path for "which tokens dominate
  * the corpus" where an exact groupBy would shuffle the full vocabulary.
  *
  * Guarantees (merge-order independent — Agarwal et al., "Mergeable
  * Summaries"): estimates never exceed the true count, and undercount by at
  * most `N / (k + 1)` where `N` is the total item count, because every
  * decrement event removes the same amount from at least `k + 1` counters
  * and at most `N` total weight exists. Hence every item with true count
  * above `N / (k + 1)` is guaranteed to survive in the sketch. Those two
  * facts are what the oracle-checked `text_heavy_hitters` query asserts.
  */
/** The decrement step shared by the batch aggregator below and the streaming
  * heavy-hitters operator (`Streaming.heavyHittersStream`), so both surfaces
  * carry identical sketch semantics.
  */
object MisraGries {
  /** Drop weight until at most `k` counters remain: subtract the (k+1)-th
    * largest count from every counter and remove the non-positive ones.
    */
  def shrink(b: mutable.HashMap[String, Long], k: Int): mutable.HashMap[String, Long] = {
    if (b.size <= k) return b
    val counts = b.values.toArray
    java.util.Arrays.sort(counts)
    val dec = counts(counts.length - (k + 1)) // (k+1)-th largest
    val out = mutable.HashMap.empty[String, Long]
    b.foreachEntry { (t, c) => if (c - dec > 0) out(t) = c - dec }
    out
  }
}

final class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  private def shrink(b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGries.shrink(b, k)

  override def reduce(b: mutable.HashMap[String, Long], t: String): mutable.HashMap[String, Long] = {
    b(t) = b.getOrElse(t, 0L) + 1L
    if (b.size > k) shrink(b) else b
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreachEntry { (t, c) => big(t) = big.getOrElse(t, 0L) + c }
    shrink(big)
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
