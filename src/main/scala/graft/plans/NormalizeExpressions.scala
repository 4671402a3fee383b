package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — canonical composition (e + U+0301 → é).
  *
  * Why custom: Spark has no normalization builtin (regexp/translate
  * cannot express canonical composition), and a corpus-curation pass
  * must canonicalize before hashing or identical-looking texts dedup
  * apart. `java.text.Normalizer` is JDK-only, so this stays offline and
  * dependency-free; the expression is codegen'd so it rides inside
  * whole-stage codegen like any builtin.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for ~all real corpus text (ASCII is always NFC) — the quick
  * check skips the composer entirely for clean input.
  */
object NormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** string → NFC-normalized string. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeUtil.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.NormalizeUtil.nfc($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpressions {
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(NfcNormalize(
      org.apache.spark.sql.graft.ColumnBridge.expression(text)))
}
