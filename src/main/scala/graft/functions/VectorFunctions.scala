package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, as pure
  * higher-order-function expressions (codegen'd; no UDF, no ml.Vector
  * boxing).
  *
  * Numeric contract: elements are cast to double FIRST, then combined with
  * a SEQUENTIAL left fold (`aggregate`), so the result is a deterministic
  * IEEE-754 operation sequence — bit-identical to the DuckDB oracle's
  * `list_reduce` fold. (A float-accumulating dot product, like DuckDB's
  * built-in `list_cosine_similarity`, drifts at the 1e-7 level and cannot
  * be hash-compared.)
  */
object VectorFunctions {

  /** Element-wise double view of a float array column. A native array
    * CAST, not `transform(_.cast)`: the HOF is CodegenFallback and drags
    * the whole enclosing projection out of whole-stage codegen, while the
    * cast is codegen'd — and float→double widening is exact either way. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product of two double arrays — the codegen'd native expression
    * (bit-identical to the sequential HOF fold it replaced; see
    * graft.plans.DotProductF64). */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotF64(a, b)

  /** L2 norm via the same sequential dot. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity with pre-computed norms: dot / (normA * normB). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    cosineWithNorms(ad, bd, norm(ad), norm(bd))
  }

  /** Deterministic pseudo-random hyperplane component: unit-free double in
    * (-1, 1) derived from (seed, plane, dim) via xxhash64 — the same value
    * on every executor with zero data movement (no driver-side RNG state,
    * no broadcast of a random matrix needed). */
  def planeComponent(plane: Int, dim: Column, seed: Long): Column =
    (xxhash64(lit(seed), lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-bit of the projection of `v` onto pseudo-random hyperplane
    * `plane`: the building block of the LSH bucketer. */
  def lshBit(v: Column, plane: Int, seed: Long): Column = {
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x * planeComponent(plane, i, seed)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Random-hyperplane LSH bucket id (nBits sign bits packed in a long).
    * Cosine-similar vectors collide with high probability; used to
    * restrict ANN search to one bucket (+ optional neighbor probes).
    * Codegen'd single-pass expression — bit-identical to the HOF
    * derivation [[lshBucketHof]] (equivalence locked in VectorSpec), but
    * one array traversal instead of nBits interpreted folds. */
  def lshBucket(v: Column, nBits: Int, seed: Long = 42L): Column =
    graft.plans.VectorExpressions.lshBucket(v, nBits, seed)

  /** Per-plane projection values behind [[lshBucket]] (same planes, same
    * fold) — the probe-side margins for query-directed multi-probe. */
  def lshProjections(v: Column, nBits: Int, seed: Long = 42L): Column =
    graft.plans.VectorExpressions.lshProjections(v, nBits, seed)

  /** The declarative (HOF) derivation of [[lshBucket]] — the readable
    * spec of the hash family; interpreted per bit, so only used as the
    * equivalence-test reference, never in a hot path. */
  private[graft] def lshBucketHof(v: Column, nBits: Int, seed: Long = 42L): Column =
    (0 until nBits).map(p => shiftleft(lshBit(v, p, seed), p))
      .reduce(_ + _)
}
