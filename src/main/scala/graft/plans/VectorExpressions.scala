package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the hot inner loop of the vector
  * operators: a codegen'd double-array dot product.
  *
  * Why custom (SURVEY §7.3 rule: promote only on measured need): the
  * declarative form `aggregate(zip_with(a,b,_*_),0d,_+_)` is exact but
  * higher-order functions evaluate their lambdas interpreted, one boxed
  * call per element — measured ~20 s for the 2M-pair near-dup join at
  * sf0.1. This expression emits a tight primitive loop inside whole-stage
  * codegen instead.
  *
  * Numeric contract: SEQUENTIAL left-to-right accumulation, identical to
  * the HOF fold and to the DuckDB oracle's `list_reduce` — bit-exact
  * replacement (0.0+x ≡ x for the first element).
  */
case class DotProductF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for the codegen'd dot product. */
  def dotF64(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(DotProductF64(
      org.apache.spark.sql.graft.ColumnBridge.expression(a), org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
