package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE's runtime skew-join split
  * does not cover (aggregation hot keys, stream-static joins, fixed
  * pre-partitioning). SURVEY §4.1 / builder rules: "Skewed keys →
  * salting or AQE skew-join".
  *
  * Technique (public, standard): append a salt in [0, saltN) to the big
  * side's key, replicate the small side saltN times, join/aggregate on
  * (key, salt), then merge. Results are exactly equal to the unsalted
  * plan; the hot key's rows now spread over saltN tasks.
  */
object Skew {

  /** Deterministic uniform salt: hash of the ROW CONTENT, never of
    * position. `monotonically_increasing_id`/`rand` are nondeterministic
    * across task retries — used as a shuffle key they can re-salt rows
    * into different reduce partitions on stage recomputation and
    * duplicate/drop rows (the SPARK-23207 hazard). A content hash is
    * retry-stable. Limitations, by construction: map-typed columns are
    * excluded (xxhash64 rejects MapType), and rows that are byte-identical
    * across ALL hashed columns share a salt — full-duplicate hot rows
    * won't spread (any deterministic content function has this property;
    * pre-aggregate or add a disambiguating column upstream for that case). */
  /** Shared with Lake.writeValid — one definition of the retry-stable
    * content salt, so fixes (like the MapType exclusion) apply everywhere. */
  private[graft] def saltCol(df: DataFrame, saltN: Int): Column = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = df.schema.fields.filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toSeq
    require(hashable.nonEmpty, "no hashable columns to derive a deterministic salt from")
    pmod(xxhash64(hashable: _*), lit(saltN.toLong))
  }

  /** Inner equi-join with a salted big side and a replicated small side.
    * Exactly equivalent to big.join(small, key); hot keys fan out over
    * saltN partitions instead of one straggler task. */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      saltN: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", saltCol(big, saltN))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltN - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for decomposable aggregates: partial
    * per (key, salt), final per key. `sum`s and `count`s re-merge with
    * sum; decimal sums stay exact, so results equal the direct groupBy. */
  def saltedSumCount(df: DataFrame, key: String, valueExpr: Column,
                     saltN: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(df, saltN))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueExpr).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("cnt"))
}
