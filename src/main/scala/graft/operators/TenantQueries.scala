package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tenant-scoped query API (SURVEY §7.1 #5).
  *
  * Reference semantics: the saved Athena query `SELECT * FROM t WHERE
  * tenant='X'` (athena-saved-query-stack.ts:16) plus the C3 rule — the
  * SERVER decides the tenant (multi-tenant-apigateway-stack.ts:126), so the
  * engine APPENDS the tenant predicate from the authenticated context; a
  * caller can never widen it.
  *
  * Efficiency: because `tenant` is a partition column of the lake layout,
  * this predicate becomes a partition filter in `FileSourceScanExec` —
  * executors never open other tenants' files. That partition pruning is the
  * reference system's raison d'être (SURVEY §4.1) and is what makes the
  * query O(one tenant) instead of O(lake) at 100 TB.
  */
final case class TenantContext(tenantId: String, user: String = "anonymous")

object TenantQueries {

  /** The one user-facing query of the reference, tenant-enforced. */
  def queryByTenant(spark: SparkSession, table: String)(implicit ctx: TenantContext): DataFrame =
    spark.table(table).filter(col("tenant") === lit(ctx.tenantId))

  /** General passthrough: arbitrary user SQL over a view that is already
    * tenant-filtered — the caller's SQL physically cannot see other
    * tenants' rows (isolation by construction, not by convention). */
  def sqlInTenantScope(spark: SparkSession, table: String, userSql: String,
                       viewName: String = "tenant_events")(implicit ctx: TenantContext): DataFrame = {
    queryByTenant(spark, table).createOrReplaceTempView(viewName)
    spark.sql(userSql)
  }

  /** True iff the physical plan prunes on the tenant partition column —
    * test hook for the §5.2-t1 pruning assertion. */
  def prunesOnTenant(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters") && plan.contains("tenant")
  }
}
