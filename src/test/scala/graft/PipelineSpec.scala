package graft

import graft.ingest.Ingest
import graft.operators.{TenantContext, TenantQueries}
import graft.sources.Lake
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice: validate → project → enrich →
  * partitioned write + error path → catalog → tenant-pruned query. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("""{"Data":{"event":"user_clicked_product_search_button","region":"US","device":"TV"}}""", "acme"),
    ("""{"Data":{"event":"page_view","region":"EU","device":"phone","extra":"kept-open-schema"}}""", "acme"),
    ("""{"Data":{"event":"page_view","region":"EU"}}""", "acme"),      // missing device
    ("""not json at all""", "acme"),                                   // corrupt
    ("""{"Data":{"event":"x","region":"APAC","device":"web"}}""", "globex"))

  test("validate/split: one pass yields both valid and error outputs") {
    val df = rows.toDF("raw", "tenant_key")
    val (valid, errors) = Ingest.validateAndSplit(df, "raw")
    assert(valid.count() == 3)
    val errTypes = errors.select("error_type").as[String].collect().sorted
    assert(errTypes.toSeq == Seq("parse-error", "validation-error"))
  }

  test("enrichment preserves payload and injects server-side tenant") {
    val df = rows.take(1).toDF("raw", "tenant_key")
    val (valid, _) = Ingest.validateAndSplit(df, "raw")
    val enriched = Ingest.enrich(valid, col("tenant_key"), lit(1704067199L))
    val r = enriched.select("device", "event", "region", "TenantId", "timestamp").head()
    assert(r.getString(0) == "TV")
    assert(r.getString(1) == "user_clicked_product_search_button")
    assert(r.getString(3) == "acme")
    assert(r.getLong(4) == 1704067199L)
  }

  test("end-to-end: partitioned lake + catalog + tenant query with pruning") {
    val root = tmpDir("lake")
    val df = rows.toDF("raw", "tenant_key")
    val (valid, errors) = Ingest.validateAndSplit(df, "raw")
    // fixed epoch: 2023-12-31T23:59:59Z → year=2023, hour=23 (UTC parity)
    val enriched = Ingest.derivePartitions(
      Ingest.enrich(valid, col("tenant_key"), lit(1704067199L))).drop("raw", "tenant_key")
    Lake.writeValid(enriched, root)
    Lake.writeErrors(errors, root)
    Lake.registerExternal(spark, "t_events", s"$root/data")

    implicit val ctx: TenantContext = TenantContext("acme")
    val q = TenantQueries.queryByTenant(spark, "t_events")
    assert(q.count() == 2)
    assert(TenantQueries.prunesOnTenant(q), "expected partition filter on tenant")
    assert(q.select("year", "month", "day", "hour").distinct().head() ==
      org.apache.spark.sql.Row("2023", "12", "31", "23"))
    // isolation: no cross-tenant rows
    assert(q.filter($"tenant" =!= "acme").count() == 0)
    // error routing parity: error/<error-type>/ layout exists
    val errDf = spark.read.parquet(s"$root/error")
    assert(errDf.select("error_type").distinct().count() == 2)
  }

  test("open schema: a later batch with extra fields merges on refresh") {
    val root = tmpDir("evolve")
    val b1 = Seq(("""{"Data":{"event":"e1","region":"US","device":"TV"}}""", "acme"))
      .toDF("raw", "tenant_key")
    val b2 = Seq(("""{"Data":{"event":"e2","region":"EU","device":"web","channel":"mobile"}}""", "acme"))
      .toDF("raw", "tenant_key")
    def ingest(df: org.apache.spark.sql.DataFrame, extra: Boolean): Unit = {
      val (valid, _) = Ingest.validateAndSplit(df, "raw")
      val withExtra = if (extra)
        valid.withColumn("channel", get_json_object(col("raw"), "$.Data.channel"))
      else valid
      val enriched = Ingest.derivePartitions(
        Ingest.enrich(withExtra, col("tenant_key"), lit(1704067199L)))
        .drop("raw", "tenant_key")
      Lake.writeValid(enriched, root)
    }
    ingest(b1, extra = false)
    ingest(b2, extra = true)
    // crawler analog re-run picks up the merged schema (mergeSchema read)
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$root/data")
    assert(merged.columns.contains("channel"))
    assert(merged.count() == 2)
    assert(merged.filter(col("channel").isNull).count() == 1)
  }

  test("tenant-scoped SQL passthrough cannot see other tenants") {
    implicit val ctx: TenantContext = TenantContext("acme")
    val out = TenantQueries.sqlInTenantScope(spark, "t_events",
      "SELECT tenant, count(*) AS n FROM tenant_events GROUP BY tenant")
    val ts = out.select("tenant").as[String].collect().toSet
    assert(ts == Set("acme"))
  }
}
