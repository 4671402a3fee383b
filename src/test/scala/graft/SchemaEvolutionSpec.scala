package graft

import graft.sources.{Lake, Maintenance}
import org.apache.spark.sql.functions._

/** Crawler schema-evolution gate (SURVEY §3.2): a re-crawl must surface
  * columns added by later writers, old files must read NULL for them, and
  * tenant-scoped queries over the evolved table must still prune. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(tenant: String) = spark.range(3).toDF("event_id")
    .withColumn("tenant", lit(tenant)).withColumn("year", lit("2024"))
    .withColumn("month", lit("03")).withColumn("day", lit("01"))
    .withColumn("hour", lit("00"))

  test("re-crawl surfaces an evolved schema; old rows read NULL; pruning survives") {
    val root = tmpDir("evolve")
    spark.sql("DROP TABLE IF EXISTS evolve_tbl")
    Lake.writeValid(rows("t0"), root)
    Maintenance.refreshOnce(spark, "evolve_tbl", s"$root/data")
    assert(spark.table("evolve_tbl").count() == 3)
    assert(!spark.table("evolve_tbl").columns.contains("quality"))

    // batch 2: an external writer lands files WITH A NEW COLUMN
    Lake.writeValid(rows("t1").withColumn("quality", lit("hi")), root)
    Maintenance.refreshOnce(spark, "evolve_tbl", s"$root/data")

    val t = spark.table("evolve_tbl")
    assert(t.columns.contains("quality"), "re-crawl must surface the new column")
    assert(t.count() == 6)
    // files written before the evolution read NULL for the new column
    assert(t.filter($"quality".isNull).select("tenant").distinct()
      .as[String].collect().toSeq == Seq("t0"))
    assert(t.filter($"quality" === "hi").count() == 3)

    // the evolved table still partition-prunes on tenant
    import graft.operators.{TenantContext, TenantQueries}
    implicit val ctx: TenantContext = TenantContext("t1")
    val scoped = TenantQueries.queryByTenant(spark, "evolve_tbl")
    assert(TenantQueries.prunesOnTenant(scoped), "evolved table must prune on tenant")
    assert(scoped.count() == 3)

    // a drift-free crawl keeps the catalog entry (no needless DROP+CREATE)
    val created = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("evolve_tbl")).createTime
    Maintenance.refreshOnce(spark, "evolve_tbl", s"$root/data")
    val created2 = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("evolve_tbl")).createTime
    assert(created2 == created, "no-drift crawl must not recreate the table")
  }
}
