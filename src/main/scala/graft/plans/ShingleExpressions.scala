package graft.plans

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass distinct word-k-shingle construction.
  *
  * Why custom (measured need): the declarative form — split → filter →
  * transform(sequence) → slice → concat_ws → array_distinct — runs five
  * interpreted higher-order lambdas per row and measured 5.8 s for 5 k
  * docs at sf0.1, and every dedup stage recomputes it through lineage.
  * This expression tokenizes, shingles, and dedups in one JVM loop.
  *
  * Semantics identical to the declarative version (and the DuckDB
  * oracle): lowercase, whitespace-split, drop empty tokens, join k
  * consecutive tokens with a single space, keep first-occurrence order
  * of distinct shingles; fewer than k tokens → empty array.
  */
object ShingleUtil {
  def shingleSet(text: UTF8String, k: Int): ArrayData = {
    val words = text.toLowerCase.toString.split("\\s+")
    val out = new JLinkedHashSet[String]()
    var i = 0
    val n = words.length
    // skip leading empty token produced by leading whitespace
    val toks = new java.util.ArrayList[String](n)
    while (i < n) { if (!words(i).isEmpty) toks.add(words(i)); i += 1 }
    val m = toks.size
    if (m >= k) {
      var s = 0
      val sb = new java.lang.StringBuilder(64)
      while (s <= m - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks.get(s + j))
          j += 1
        }
        out.add(sb.toString)
        s += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(arr)
  }
}

/** Single-pass hashed word-k-shingle buckets — the DSIR feature map
  * ([[graft.operators.Sampling.bigramBuckets]]) as one JVM loop.
  *
  * Why custom (measured need): the declarative form nests THREE
  * interpreted higher-order lambdas (transform over shingles over a
  * char-fold aggregate), and `explode` over that expression re-evaluates
  * it per OUTPUT row — the importance-model count pass measured 9.9 s
  * for 5 k docs at sf0.1 where the single-evaluation projection is
  * 0.35 s. One codegen'd loop makes the expression cheap enough that
  * re-evaluation is irrelevant.
  *
  * Semantics identical to the declarative version (and the DuckDB
  * oracle): lowercase, whitespace-split, drop empty tokens, join k
  * consecutive tokens with one space, per SHINGLE OCCURRENCE (not
  * distinct) fold its characters c as acc = (acc·31 + codepoint(c))
  * mod 1e9+7, bucket = hash mod buckets; fewer than k tokens → empty. */
object ShingleBucketUtil {
  private val Mod = 1000000007L
  def shingleBuckets(text: UTF8String, k: Int, buckets: Int): ArrayData = {
    val words = text.toLowerCase.toString.split("\\s+")
    val toks = new java.util.ArrayList[String](words.length)
    var i = 0
    while (i < words.length) {
      if (!words(i).isEmpty) toks.add(words(i)); i += 1
    }
    val m = toks.size
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - k + 1)
    var s = 0
    while (s <= m - k) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) h = (h * 31L + ' '.toLong) % Mod
        val w = toks.get(s + j)
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          h = (h * 31L + cp.toLong) % Mod
          ci += Character.charCount(cp)
        }
        j += 1
      }
      out(s) = (h % buckets).toInt
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** string text → array<int> of hashed word-k-shingle buckets. */
case class HashedShingleBuckets(child: Expression, k: Int, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "hashed_shingle_buckets"

  override def nullSafeEval(input: Any): Any =
    ShingleBucketUtil.shingleBuckets(input.asInstanceOf[UTF8String], k, buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.ShingleBucketUtil.shingleBuckets($a, $k, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string text → array<string> of distinct word k-shingles. */
case class WordShingleSet(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingle_set"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleSet(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.ShingleUtil.shingleSet($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpressions {
  def wordShingleSet(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(WordShingleSet(
      org.apache.spark.sql.graft.ColumnBridge.expression(text), k))

  def hashedShingleBuckets(text: Column, k: Int, buckets: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(HashedShingleBuckets(
      org.apache.spark.sql.graft.ColumnBridge.expression(text), k, buckets))
}
