package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Distinct-array intersection cardinality in one pass.
  *
  * Why custom (measured need): pair verification computed
  * `size(array_intersect) / size(array_union)` — two hash-set builds and
  * two materialized arrays per candidate pair. For SET inputs (already
  * distinct), |A∪B| = |A|+|B|-|A∩B|, so one hash-set + a membership count
  * yields the same Jaccard with ~4× less allocation.
  */
object IntersectUtil {
  def count(a: ArrayData, b: ArrayData): Int = {
    val set = new java.util.HashSet[Any](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { set.add(a.getUTF8String(i)); i += 1 }
    var n = 0
    var j = 0
    while (j < b.numElements()) {
      if (set.contains(b.getUTF8String(j))) n += 1
      j += 1
    }
    n
  }
}

/** (array<string>, array<string>) → int intersection count. */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectUtil.count($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetExpressions {
  def arrayIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(ArrayIntersectCount(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
