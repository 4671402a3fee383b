package graft.operators

import graft.plans.ZOrderExpressions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering for multi-dimensional range
  * pruning — the lake-layout lever when queries range-filter on TWO
  * columns: a linear sort clusters row groups on one dimension only
  * (perfect min/max pruning on it, none on the other); interleaving the
  * two keys' bits and sorting by the result clusters on both at once,
  * so a 2-D box predicate skips row groups on either dimension's stats.
  * This is the standard Delta/Iceberg OPTIMIZE ZORDER technique,
  * expressed as a plain column + sort so any writer can use it.
  *
  * Scale shape: one metadata-scale min/max aggregate (4 longs to the
  * driver), a per-row codegen'd key, and a range-repartition + in-task
  * sort — the same cost as any clustered write; no extra pass. Scaling
  * is exact integer arithmetic (IntegralDivide), so the DuckDB oracle
  * reproduces keys bit-for-bit.
  */
object ZOrder {

  /** a DIV b on longs (Catalyst IntegralDivide — truncating integer
    * division, ≡ DuckDB `//` for the non-negative operands used here). */
  private def idiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Min-max scale a long column into [0, 2^bits): ((v-lo)·(2^bits-1))
    * DIV (hi-lo). Callers keep (hi-lo)·(2^bits-1) < 2^63 — true for any
    * id/epoch range at bits ≤ 16. Degenerate hi==lo → 0. */
  def scaled(v: Column, lo: Long, hi: Long, bits: Int): Column =
    if (hi == lo) lit(0L)
    else idiv((v.cast("long") - lit(lo)) * lit((1L << bits) - 1), lit(hi - lo))

  /** Morton key from two raw long columns with known value ranges. */
  def zKey(x: Column, xLo: Long, xHi: Long,
           y: Column, yLo: Long, yHi: Long, bits: Int = 8): Column =
    ZOrderExpressions.zOrderKey2(
      scaled(x, xLo, xHi, bits), scaled(y, yLo, yHi, bits), bits)

  /** df + `z_key`, globally ordered along the Z-curve (range repartition
    * + in-task sort), ready for a clustered write. The min/max aggregate
    * collects exactly 4 longs — metadata-scale.
    *
    * `numFiles`: when set, the range repartition targets exactly that
    * many partitions (= output files for a direct write). An EXPLICIT
    * count also disables AQE's small-partition coalescing for this
    * shuffle — at gate scale AQE otherwise folds the whole curve into
    * one file and there is nothing left for file-level stats to prune;
    * writers that want file-level zone-map skipping should size this to
    * their target file count. Default keeps the session's planning
    * (fine when only the key order matters). */
  def zOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int = 8,
               numFiles: Option[Int] = None): DataFrame = {
    val Row(xLo: Long, xHi: Long, yLo: Long, yHi: Long) = df.agg(
      min(col(xCol).cast("long")), max(col(xCol).cast("long")),
      min(col(yCol).cast("long")), max(col(yCol).cast("long"))).head()
    val keyed = df.withColumn("z_key",
      zKey(col(xCol), xLo, xHi, col(yCol), yLo, yHi, bits))
    numFiles.fold(keyed.repartitionByRange(col("z_key")))(
        n => keyed.repartitionByRange(n, col("z_key")))
      .sortWithinPartitions("z_key")
  }
}
