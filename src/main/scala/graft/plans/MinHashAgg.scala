package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable MinHash SET signature as an aggregate function: each group's
  * buffer is the element-wise min over all its rows' shingle hashes, so
  * the signature of a group ≈ the MinHash of the UNION of its members'
  * shingle sets. `merge` is element-wise min → the aggregate is fully
  * mergeable (map-side partial aggregation works), constant-size state —
  * the properties that make a sketch usable as a distributed aggregate
  * at 100 TB (same contract as approx_count_distinct's HLL buffer).
  *
  * Estimator: Ĵ(A,B) = |{j : sigA(j) == sigB(j)}| / n, stderr ≈
  * sqrt(J(1-J)/n).
  */
case class MinHashAgg(child: Expression, nHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < nHashes) {
          val hj = Sketches.permuteA(j) * h + Sketches.permuteB(j)
          if (hj < buf(j)) buf(j) = hj
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * nHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(nHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashAgg {
  /** Column API: minhash_agg(shingles, n) over a group. */
  def minhashAgg(shingles: Column, nHashes: Int = 64): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashAgg(org.apache.spark.sql.graft.ColumnBridge.expression(shingles), nHashes)
        .toAggregateExpression())

  /** Estimated Jaccard of two equal-length signatures: matching-slot
    * fraction (exact multiple of 1/n → deterministic double). */
  def estimatedJaccard(sigA: Column, sigB: Column): Column = {
    import org.apache.spark.sql.functions._
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA).cast("double")
  }
}
