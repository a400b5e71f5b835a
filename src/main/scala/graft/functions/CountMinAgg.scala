package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a mergeable typed aggregate: `depth × width` long
  * counters; each item increments one counter per row ((j, h_j(item))), and
  * merge is element-wise sum. Point estimate: `est(t) = min_j counter(j,
  * h_j(t))` — only ever an overcount, by at most `N / width` per row in
  * expectation (Cormode & Muthukrishnan).
  *
  * Because update and merge are commutative + associative sums, the finished
  * sketch is bit-identical regardless of partitioning or merge order — which
  * is what lets `text_countmin_est` carry an EXACT DuckDB oracle (the oracle
  * recomputes each bucket as the sum of exact counts of the terms hashing
  * into it; contrast Misra-Gries, whose estimates are merge-order dependent
  * and oracle-checked only through bound booleans).
  *
  * State is O(depth·width) longs however large the vocabulary — the 100 TB
  * path for per-term frequency estimates with no vocabulary-sized shuffle:
  * partial sketches combine map-side, one array crosses the wire per task.
  *
  * `hash(j, item)` must return a bucket in [0, width) and be deterministic
  * (callers pass the portable h60 so the oracle can mirror it).
  */
final class CountMinAgg(depth: Int, width: Int, hash: (Int, String) => Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], t: String): Array[Long] = {
    var j = 0
    while (j < depth) { b(j * width + hash(j, t)) += 1L; j += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
