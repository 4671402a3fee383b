package graft

import graft.operators.TenantContext
import org.apache.spark.sql.functions._

/** The facade end-to-end: the README's "switch from the reference" path. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("engine lifecycle: ingest -> catalog -> tenant query") {
    val engine = Engine(spark, tmpDir("engine"), "engine_events")
    val raw = Seq(
      ("""{"Data":{"event":"click","region":"US","device":"TV"}}""", "acme"),
      ("""{"Data":{"event":"view","region":"EU","device":"web"}}""", "globex"),
      ("""garbage""", "acme"))
      .toDF("raw", "tenant_key")
    val (nValid, nErr) = engine.ingestBatch(raw, "raw", col("tenant_key"), lit(1704067199L))
    assert(nValid == 2 && nErr == 1)
    implicit val ctx: TenantContext = TenantContext("acme")
    assert(engine.query.count() == 1)
    val out = engine.sql("SELECT event, region FROM tenant_events")
      .as[(String, String)].collect()
    assert(out.toSeq == Seq(("click", "US")))
  }
}
