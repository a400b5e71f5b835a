package graft.tools

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

import graft.core.{AeChunker, RabinChunker}
import graft.plans.CdcSegmentBounds

/** Scratch (VERDICT r10 #9): codegen headroom of the CodegenFallback native
  * expressions. Times (a) CdcSegmentBounds.eval — the interpreted path with
  * full child-dispatch overhead — against (b) the bare boundsInRange scan it
  * wraps, on the same payload. (a) − (b) is the MOST a doGenCode
  * implementation could recover (perfect codegen compiles to exactly (b)
  * plus array copying). No Spark session needed.
  */
object TimeSegEval {
  def main(args: Array[String]): Unit = {
    val mb = if (args.nonEmpty) args(0).toInt else 16
    val bytes = new Array[Byte](mb << 20)
    new java.util.Random(42L).nextBytes(bytes)
    val reps = 5

    for (algo <- Seq("ae", "rabin")) {
      val expected = 4096
      val expr = CdcSegmentBounds(
        Literal(bytes, BinaryType), Literal.create(algo, StringType),
        Literal(expected, IntegerType), Literal(42L, LongType),
        Literal(0, IntegerType), Literal(1, IntegerType))
      val direct: (Array[Byte], Int, Int) => Array[Int] = algo match {
        case "ae" => AeChunker(expected).boundsInRange
        case _ => RabinChunker(expected, 42).boundsInRange
      }
      expr.eval(InternalRow.empty); direct(bytes, 0, bytes.length) // JIT warmup
      val tExpr = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); expr.eval(InternalRow.empty); (System.nanoTime() - t0) / 1e9
      }.min
      val tDirect = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); direct(bytes, 0, bytes.length); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"SEGEVAL $algo%-6s payload=${mb}MB expr=${tExpr}%.4fs direct=${tDirect}%.4fs " +
        f"headroom=${(tExpr - tDirect).max(0) / tExpr * 100}%.1f%%")
    }
  }
}
