package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `array<double>` columns:
  * `vec_dot(a, b) = Σ a[i]·b[i]`, accumulated left-to-right.
  *
  * This replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order
  * pipeline in the similarity operators: array HOFs are CodegenFallback
  * (a fresh interpreted lambda evaluation per element, with boxing), while
  * this expression compiles to a tight primitive loop inside
  * WholeStageCodegen — the difference is ~20× per element on 64-dim vectors,
  * which is the entire inner loop of ANN search at scale.
  *
  * Determinism contract: the accumulation order is the same sequential
  * left fold as the HOF form and DuckDB's `list_dot_product`, so results
  * stay bit-identical to the oracle. A null array element throws (ADVICE
  * r2: `getDouble` would otherwise silently read it as 0.0, diverging from
  * the NULL-propagating HOF form); the check is only emitted when the input
  * schema has `containsNull=true`, so provably-non-nullable arrays keep the
  * branch-free loop. Mismatched lengths take the shorter prefix.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elemsNullable(left) || elemsNullable(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) VecDot.failNullElement(i)
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val nullCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) graft.plans.VecDot.failNullElement($i);"
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Called from generated code (via the static forwarder on the companion
    * class) and interpreted eval when an array element is null.
    */
  def failNullElement(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"vec_dot: null array element at index $i — vec_dot requires dense " +
        "arrays; coalesce or filter null elements before calling")
}
