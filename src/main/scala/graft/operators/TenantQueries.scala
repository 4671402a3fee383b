package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, UnresolvedWith}
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

  /** General passthrough: user SQL over a view that is already
    * tenant-filtered. Isolation is ENFORCED, not assumed: `spark.sql` runs
    * with full catalog access, so before execution the query is parsed and
    * every table reference must resolve to the tenant view (or a CTE the
    * query itself defines) — SQL naming the unfiltered base table, any
    * other table, or any catalog command is rejected. The walk covers CTE
    * bodies and subqueries in expressions (EXISTS/IN/scalar), so a
    * reference cannot hide inside either. */
  def sqlInTenantScope(spark: SparkSession, table: String, userSql: String,
                       viewName: String = "tenant_events")(implicit ctx: TenantContext): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(userSql)
    require(!parsed.isInstanceOf[Command],
      "tenant-scoped SQL must be a query, not a command")
    val (refs, cteNames) = referencedRelations(parsed)
    val illegal = refs -- cteNames - viewName.toLowerCase
    require(illegal.isEmpty,
      s"tenant-scoped SQL may only reference '$viewName' (and its own CTEs); " +
        s"found: ${illegal.toSeq.sorted.mkString(", ")}")
    queryByTenant(spark, table).createOrReplaceTempView(viewName)
    spark.sql(userSql)
  }

  /** All relation names a parsed (unresolved) plan references, plus the
    * CTE names it defines. Recurses into CTE bodies explicitly
    * (`UnresolvedWith` keeps them as innerChildren, which `collect` does
    * not traverse) and into subquery expressions. */
  private def referencedRelations(plan: LogicalPlan): (Set[String], Set[String]) = {
    var refs = Set.empty[String]
    var ctes = Set.empty[String]
    def walk(n: LogicalPlan): Unit = {
      n match {
        case w: UnresolvedWith =>
          ctes ++= w.cteRelations.map(_._1.toLowerCase)
          w.cteRelations.foreach { rel => walk(rel._2) }
        case r: UnresolvedRelation =>
          refs += r.multipartIdentifier.map(_.toLowerCase).mkString(".")
        case _ => ()
      }
      n.children.foreach(walk)
      n.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => walk(sq.plan)
        case _ => ()
      })
    }
    walk(plan)
    (refs, ctes)
  }

  /** True iff the physical plan prunes on the tenant partition column —
    * test hook for the §5.2-t1 pruning assertion. */
  def prunesOnTenant(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters") && plan.contains("tenant")
  }
}
