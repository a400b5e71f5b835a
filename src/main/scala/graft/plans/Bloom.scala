package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared bit-position math for the Bloom filter: the aggregate that SETS
  * bits (graft.functions.BloomAgg) and the expression that TESTS them
  * (bloom_contains) must derive identical positions from a 64-bit item
  * hash, so both call these statics — there is exactly one definition of
  * the probe sequence.
  *
  * Positions use Kirsch–Mitzenmacher double hashing: pos_i = (h + i·h2)
  * masked to the (power-of-two) bit width, with h2 an odd avalanche of the
  * high bits so the k probes decorrelate. k probes touch k bits — O(k) per
  * membership test regardless of how many items went in, which is the
  * whole point versus a sorted-list or hash-set broadcast.
  */
object BloomUtil {
  def pos(h: Long, i: Int, mBits: Int): Int = {
    val h2 = ((h >>> 33) * 0xff51afd7ed558ccdL) | 1L
    ((h + i.toLong * h2) & (mBits.toLong - 1L)).toInt
  }

  def set(bits: Array[Byte], h: Long, k: Int): Unit = {
    val m = bits.length << 3
    var i = 0
    while (i < k) {
      val p = pos(h, i, m)
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** True iff all k probe bits for h are set (never a false negative). */
  def contains(bits: Array[Byte], h: Long, k: Int): Boolean = {
    val m = bits.length << 3
    var i = 0
    while (i < k) {
      val p = pos(h, i, m)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_contains(bloom: binary, h: bigint, k: int)` — native membership
  * test against a BloomAgg bitset. Codegen emits a single static call into
  * [[BloomUtil]], so the probe loop runs as compiled JVM code inside
  * WholeStageCodegen (usable inside array HOF lambdas for per-doc
  * "any n-gram hits the filter" prefilters without a UDF).
  */
case class BloomContains(bloom: Expression, hash: Expression, k: Expression)
    extends TernaryExpression {

  override def first: Expression = bloom
  override def second: Expression = hash
  override def third: Expression = k

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloom.dataType == BinaryType && hash.dataType == LongType &&
      k.dataType == IntegerType && k.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects (binary, bigint, int literal), got " +
        s"(${bloom.dataType.simpleString}, ${hash.dataType.simpleString}, ${k.dataType.simpleString})")

  override protected def nullSafeEval(b: Any, h: Any, kk: Any): Any =
    BloomUtil.contains(b.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], kk.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h, kk) => s"graft.plans.BloomUtil.contains($b, $h, $kk)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomContains =
    copy(bloom = newFirst, hash = newSecond, k = newThird)
}
