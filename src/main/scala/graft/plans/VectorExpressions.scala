package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

/** Random-hyperplane LSH bucket of a double-array vector: all `nBits`
  * projections in ONE pass over the vector, inside whole-stage codegen.
  *
  * Why custom (measured need, SURVEY §7.3): the declarative form folds a
  * `zip_with`+`aggregate` HOF PER BIT — 6 interpreted passes per row for a
  * 6-bit bucket, the exact pattern measured at 20-30× vs codegen for the
  * dot product. The bucketer runs on every corpus row, so at 100 TB it is
  * the dominant cost of the LSH ANN/dedup paths.
  *
  * BIT-IDENTICAL to the HOF derivation it replaces
  * (VectorFunctions.lshBucketHof — kept as the spec'd reference):
  * component(plane, i) = xxhash64(seed, plane, i) / Long.MaxValue with
  * Spark's XxHash64 chaining (init 42, hashLong for the Long seed, hashInt
  * for the Int plane/index), projection = the same sequential
  * left-to-right double fold, sign bit packed at position `plane`.
  * Assumes non-null array elements (embedding vectors). */
case class LshBucket(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val h0 = XXH64.hashLong(seed, 42L)
    val planeSeed = new Array[Long](nBits)
    var p = 0
    while (p < nBits) { planeSeed(p) = XXH64.hashInt(p, h0); p += 1 }
    val proj = new Array[Double](nBits)
    val n = v.numElements()
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var q = 0
      while (q < nBits) {
        proj(q) += x * (XXH64.hashInt(i, planeSeed(q)).toDouble / Long.MaxValue.toDouble)
        q += 1
      }
      i += 1
    }
    var bucket = 0L
    var b = 0
    while (b < nBits) { if (proj(b) >= 0) bucket |= (1L << b); b += 1 }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val ps = ctx.freshName("planeSeed")
      val proj = ctx.freshName("proj")
      val h0 = ctx.freshName("h0")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val bk = ctx.freshName("bucket")
      s"""
         |long $h0 = $xxh.hashLong(${seed}L, 42L);
         |long[] $ps = new long[$nBits];
         |for (int $p = 0; $p < $nBits; $p++) {
         |  $ps[$p] = $xxh.hashInt($p, $h0);
         |}
         |double[] $proj = new double[$nBits];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  for (int $p = 0; $p < $nBits; $p++) {
         |    $proj[$p] += $x * (((double) $xxh.hashInt($i, $ps[$p])) / (double) Long.MAX_VALUE);
         |  }
         |}
         |long $bk = 0L;
         |for (int $p = 0; $p < $nBits; $p++) {
         |  if ($proj[$p] >= 0) $bk |= (1L << $p);
         |}
         |${ev.value} = $bk;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The raw hyperplane projections behind [[LshBucket]] — BIT-IDENTICAL
  * plane derivation and fold, returning the per-plane projection values
  * instead of their packed signs. Powers query-directed multi-probe: the
  * magnitude |proj(b)| is the margin to hyperplane b, i.e. the cost of
  * probing the bucket with bit b flipped. Runs on the PROBE side only
  * (few rows); the corpus side never needs the margins. */
case class LshProjections(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "lsh_projections"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val h0 = XXH64.hashLong(seed, 42L)
    val planeSeed = new Array[Long](nBits)
    var p = 0
    while (p < nBits) { planeSeed(p) = XXH64.hashInt(p, h0); p += 1 }
    val proj = new Array[Double](nBits)
    val n = v.numElements()
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var q = 0
      while (q < nBits) {
        proj(q) += x * (XXH64.hashInt(i, planeSeed(q)).toDouble / Long.MaxValue.toDouble)
        q += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(proj)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val ps = ctx.freshName("planeSeed")
      val proj = ctx.freshName("proj")
      val h0 = ctx.freshName("h0")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      s"""
         |long $h0 = $xxh.hashLong(${seed}L, 42L);
         |long[] $ps = new long[$nBits];
         |for (int $p = 0; $p < $nBits; $p++) {
         |  $ps[$p] = $xxh.hashInt($p, $h0);
         |}
         |double[] $proj = new double[$nBits];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  for (int $p = 0; $p < $nBits; $p++) {
         |    $proj[$p] += $x * (((double) $xxh.hashInt($i, $ps[$p])) / (double) Long.MAX_VALUE);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($proj);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API for the codegen'd dot product. */
  def dotF64(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(DotProductF64(
      org.apache.spark.sql.graft.ColumnBridge.expression(a), org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Column API for the codegen'd single-pass LSH bucketer. */
  def lshBucket(v: Column, nBits: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(LshBucket(
      org.apache.spark.sql.graft.ColumnBridge.expression(v), nBits, seed))

  /** Column API for the per-plane projection values (probe-side margins). */
  def lshProjections(v: Column, nBits: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(LshProjections(
      org.apache.spark.sql.graft.ColumnBridge.expression(v), nBits, seed))
}
