package graft

import graft.ingest.Ingest
import graft.operators.{TenantContext, TenantQueries}
import graft.sources.Lake
import org.apache.spark.sql.functions._

/** At-rest format parity: the reference lands ND-JSON text (Firehose
  * default); the engine's Parquet is an idiomatic substitution
  * (SURVEY §1.4). Both formats must round-trip with identical semantics
  * and tenant pruning. */
class FormatParitySpec extends SparkSpec {
  import spark.implicits._

  test("ND-JSON lake round-trips with the same rows and pruning as parquet") {
    val rows = Seq(
      ("""{"Data":{"event":"e1","region":"US","device":"TV"}}""", "acme"),
      ("""{"Data":{"event":"e2","region":"EU","device":"web"}}""", "globex"))
      .toDF("raw", "tenant_key")
    val (valid, _) = Ingest.validateAndSplit(rows, "raw")
    val enriched = Ingest.derivePartitions(
      Ingest.enrich(valid, col("tenant_key"), lit(1704067199L)))
      .drop("raw", "tenant_key")
    val jsonRoot = tmpDir("lake_json")
    val parqRoot = tmpDir("lake_parq")
    Lake.writeValid(enriched, jsonRoot, format = "json")
    Lake.writeValid(enriched, parqRoot, format = "parquet")
    val j = spark.read.json(s"$jsonRoot/data")
    val p = spark.read.parquet(s"$parqRoot/data")
    val cols = Seq("device", "event", "region", "TenantId", "timestamp",
      "tenant", "year", "month", "day", "hour")
    assert(j.select(cols.map(col): _*).collect().toSet ==
      p.select(cols.map(col): _*).collect().toSet)
    // pruning works identically on the JSON layout
    Lake.registerExternal(spark, "json_events", s"$jsonRoot/data", format = "json")
    implicit val ctx: TenantContext = TenantContext("acme")
    val q = TenantQueries.queryByTenant(spark, "json_events")
    assert(q.count() == 1 && TenantQueries.prunesOnTenant(q))
  }

  test("ORC lake round-trips with the same rows and pruning as parquet") {
    val rows = Seq(
      ("""{"Data":{"event":"e1","region":"US","device":"TV"}}""", "acme"),
      ("""{"Data":{"event":"e2","region":"EU","device":"web"}}""", "globex"))
      .toDF("raw", "tenant_key")
    val (valid, _) = Ingest.validateAndSplit(rows, "raw")
    val enriched = Ingest.derivePartitions(
      Ingest.enrich(valid, col("tenant_key"), lit(1704067199L)))
      .drop("raw", "tenant_key")
    val orcRoot = tmpDir("lake_orc")
    val parqRoot = tmpDir("lake_parq_o")
    Lake.writeValid(enriched, orcRoot, format = "orc")
    Lake.writeValid(enriched, parqRoot, format = "parquet")
    val o = spark.read.orc(s"$orcRoot/data")
    val p = spark.read.parquet(s"$parqRoot/data")
    val cols = Seq("device", "event", "region", "TenantId", "timestamp",
      "tenant", "year", "month", "day", "hour")
    assert(o.select(cols.map(col): _*).collect().toSet ==
      p.select(cols.map(col): _*).collect().toSet)
    Lake.registerExternal(spark, "orc_events", s"$orcRoot/data", format = "orc")
    implicit val ctx: TenantContext = TenantContext("globex")
    val q = TenantQueries.queryByTenant(spark, "orc_events")
    assert(q.count() == 1 && TenantQueries.prunesOnTenant(q))
  }
}
