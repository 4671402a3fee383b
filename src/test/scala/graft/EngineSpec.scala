package graft

import graft.operators.TenantContext
import org.apache.spark.sql.functions._

/** The facade end-to-end: the README's "switch from the reference" path. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("engine lifecycle: ingest -> catalog -> tenant query") {
    val engine = Engine(spark, tmpDir("engine"), "engine_events")
    spark.sql("DROP TABLE IF EXISTS engine_events_errors")
    // a lake with no dead letters reads as ZERO, not a missing-table crash
    assert(engine.errors.count() == 0)
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
    // compaction through the facade: content unchanged, tenant-scoped
    engine.compact("tenant = 'acme'")
    assert(engine.query.count() == 1)
    assert(engine.query(TenantContext("globex")).count() == 1)
    // dead-letter records are SQL-queryable (crawler-indexes-errors parity)
    assert(engine.errors.count() == 1)
    assert(engine.errors.select("error_type").as[String].head() == "parse-error")
  }

  test("engine streaming: streamed rows queryable through the facade immediately") {
    val engine = Engine(spark, tmpDir("engine_s"), "engine_stream_events")
    spark.sql("DROP TABLE IF EXISTS engine_stream_events")
    val listener = graft.streaming.Monitoring.attach(spark)
    val in = tmpDir("engine_s_in")
    Seq(("""{"Data":{"event":"click","region":"US","device":"TV"}}""", "acme"))
      .toDF("value", "tenant_key").write.mode("append").json(in)
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tenant_key",
          org.apache.spark.sql.types.StringType))))
      .json(in)
    val q = engine.startStream(raw, "value", "tenant_key", tmpDir("engine_s_ckpt"),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "stream must finish within the timeout")
    implicit val ctx: TenantContext = TenantContext("acme")
    assert(engine.query.count() == 1) // no refreshCatalog() call needed
    // the monitoring listener saw the batch (task-metrics parity); the
    // listener bus is async, so poll briefly
    val deadline = System.currentTimeMillis() + 20000
    while (listener.snapshot.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    val m = listener.snapshot
    assert(m.nonEmpty && m.map(_.inputRows).sum >= 1,
      s"listener must capture batch metrics, got $m")
    assert(graft.streaming.Monitoring.metricsTable(spark, listener)
      .columns.contains("inputRowsPerSec"))
    spark.streams.removeListener(listener)
  }
}
