package graft.tools
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val a = AttributeReference("l_returnflag", StringType, true)(ExprId(0), Nil)
    val b = AttributeReference("l_linestatus", StringType, true)(ExprId(0), Nil)
    println("attr== " + (a.canonicalized == b.canonicalized))
    println("canon a: " + a.canonicalized)
    val e1 = EqualTo(AttributeReference("l_orderkey", LongType, true)(ExprId(0), Nil),
                     AttributeReference("o_orderkey", LongType, true)(ExprId(0), Nil))
    val e2 = EqualTo(AttributeReference("l_partkey", LongType, true)(ExprId(0), Nil),
                     AttributeReference("o_custkey", LongType, true)(ExprId(0), Nil))
    println("eq== " + (e1.canonicalized == e2.canonicalized))
  }
}
