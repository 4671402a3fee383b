package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join.
  *
  * Spark plans a bare non-equi join as BroadcastNestedLoopJoin — O(n·m)
  * and broadcast-bound, hopeless at 100 TB. The composition here is the
  * standard binning rewrite: chop every interval into fixed-width time
  * bins (explode), map each point to its bin, equi-join on the bin key,
  * and re-apply the exact range predicate as a residual filter. Cost
  * becomes a shuffle equi-join on bin keys: O(points + Σ interval
  * widths / binWidth), distributing like any other join.
  *
  * Bin width is the knob: ≈ median interval length keeps the per-interval
  * explode factor ~2 while keeping bins selective.
  */
object RangeJoin {

  /** points ⋈ intervals ON start <= pointTime < end (epoch-seconds
    * columns). Exact: binning never drops a qualifying pair (a point's
    * bin is always covered by the interval's exploded bins); `distinct`
    * is unnecessary because an interval covers each point's bin at most
    * once. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: Column, startCol: Column, endCol: Column,
                      binSeconds: Long): DataFrame = {
    // floor division via pmod → correct binning for negative epochs too
    def bin(c: Column): Column =
      ((c.cast("long") - pmod(c.cast("long"), lit(binSeconds))) / binSeconds).cast("long")
    val p = points.withColumn("__bin", bin(pointTime))
    val i = intervals
      .withColumn("__bin", explode(sequence(
        bin(startCol),
        // end is exclusive, but a partial last bin still needs coverage
        bin(endCol))))
    p.join(i, Seq("__bin"))
      .filter(pointTime >= startCol && pointTime < endCol)
      .drop("__bin")
  }
}
