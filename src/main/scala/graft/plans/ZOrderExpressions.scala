package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: bit-interleave of two non-negative ints.
  *
  * Why custom: the declarative form is `2 × bits` shift/mask/or terms
  * (16–64 expression nodes) rebuilt per query; one codegen'd JVM loop
  * is faster and is the single place the bit layout is defined.
  *
  * Layout: MSB-first alternation — output bit (2b+1, 2b) takes input
  * bit b of (x, y), so sorting by the key walks the Z-curve and rows
  * close in BOTH dimensions land in the same parquet row group. Inputs
  * must already be scaled to [0, 2^bits) (see ZOrder.zKey — min-max
  * scaling is the caller's policy, the interleave is mechanical).
  */
object ZOrderUtil {
  def interleave2(x: Long, y: Long, bits: Int): Long = {
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      out = (out << 2) | (((x >>> b) & 1L) << 1) | ((y >>> b) & 1L)
      b -= 1
    }
    out
  }
}

/** Two long columns (pre-scaled to [0, 2^bits)) → one long Morton key. */
case class ZOrderKey2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62, s"zorder: 2 x $bits bits must fit a positive long")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ZOrderUtil.interleave2($a, $b, $bits);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrderExpressions {
  def zOrderKey2(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(ZOrderKey2(
      org.apache.spark.sql.graft.ColumnBridge.expression(x),
      org.apache.spark.sql.graft.ColumnBridge.expression(y), bits))
}
