package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with the
  * same key and rightTime <= leftTime (time-series point-in-time lookup).
  *
  * Spark lacks this operator; per the preference order (SURVEY §7.3 /
  * builder rules) it is COMPOSED from built-ins rather than given a
  * custom SparkPlan: union both sides, one window pass per key ordered by
  * (time, side, tiebreak), and `last(_, ignoreNulls)` carries the most
  * recent right payload forward onto left rows.
  *
  * Scale shape: ONE shuffle on the key (the window partition), then a
  * linear per-partition sweep — the same cost profile as a sort-merge
  * as-of implementation, with no custom physical operator to maintain.
  * Skewed keys follow the Skew helpers' salting pattern if needed.
  */
object AsOfJoin {

  /** left ⟕asof right. `rightPayload` columns are appended (null when no
    * right row precedes). Ties: right rows sort before left rows at equal
    * time; among equal-time right rows the greatest `rightTiebreak` wins
    * (make it unique for determinism). */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], rightTiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType)))))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(rightTiebreak).cast("long"))
      .withColumn("__payload", struct(rightPayload.map(col): _*))
      .select((keys ++ Seq("__t", "__side", "__tb", "__payload")).map(col): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
