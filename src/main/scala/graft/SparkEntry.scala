package graft

import graft.queries.{Analytics, Extensions, PipelineQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: reference-parity pipeline semantics
  * (SURVEY §2.1/§2.2) + the extended analytical surface (§2.3) + the
  * large-scale training-data operators (dedup / similarity / text /
  * multimodal). Each SQL-expressible entry has a DuckDB oracle in
  * `oracleSql` with IDENTICAL output column names and deterministic
  * ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q5-style multi-join + aggregation — exercises broadcast joins, shuffle
    * agg, and ordered output in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.queries ++ Analytics.queries ++ Extensions.queries

  def oracleSql: Map[String, String] =
    PipelineQueries.oracles ++ Analytics.oracles ++ Extensions.oracles
}
