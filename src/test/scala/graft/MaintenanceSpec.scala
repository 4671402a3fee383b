package graft

import graft.sources.{Maintenance, TransactionalLake}
import org.apache.spark.sql.functions._

/** Maintenance cadences under load: the crawler-analog refresh racing an
  * external writer, and scheduled epoch-fold retention on a transactional
  * lake. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("scheduled refresh races concurrent external writes without breaking readers") {
    val root = tmpDir("maint_cc")
    val tbl = "maint_cc_events"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def externalWrite(batch: Int): Unit =
      (0 until 20).map(i => (batch * 100L + i, s"t${i % 3}"))
        .toDF("event_id", "tenant")
        .write.mode("append").partitionBy("tenant").parquet(s"$root/data")
    externalWrite(0)
    // crawler cadence at 1 s, racing five more external appends
    val handle = Maintenance.scheduleRefresh(spark, tbl, s"$root/data", intervalSeconds = 1L)
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      // the FIRST tick registers the table; queryability is guaranteed
      // from then on (steady-state ticks never drop it)
      while (!spark.catalog.tableExists(tbl) && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(spark.catalog.tableExists(tbl), "first crawl must register the table")
      (1 to 5).foreach { b =>
        externalWrite(b)
        // the table must stay QUERYABLE through every tick (no
        // mid-recreate window for the steady-state recover path)
        assert(spark.table(tbl).count() >= 0L)
        Thread.sleep(300)
      }
      // eventually-consistent: a later crawl surfaces every external file
      var n = -1L
      while (n != 120L && System.nanoTime() < deadline) {
        Thread.sleep(500)
        spark.catalog.refreshTable(tbl)
        n = spark.table(tbl).count()
      }
      assert(n == 120L, s"crawler ticks must surface all external writes, saw $n")
      assert(handle.tickCount >= 2, "cadence must have ticked repeatedly")
      assert(handle.lastFailure.isEmpty,
        s"ticks must not fail steady-state: ${handle.lastFailure}")
    } finally handle.close()
  }

  private def epochFrame(id: Long) =
    Seq((id, s"p$id")).toDF("event_id", "payload")
      .withColumn("tenant", lit("t0")).withColumn("year", lit("2024"))
      .withColumn("month", lit("05")).withColumn("day", lit("01"))
      .withColumn("hour", lit("00"))

  test("foldAged keeps the newest keepLast epochs live and folds the rest") {
    val lake = tmpDir("maint_fold")
    (0L to 4L).foreach(e => TransactionalLake.commitEpoch(epochFrame(e), lake, e))
    val before = TransactionalLake.readCommitted(spark, lake)
      .select("event_id", "payload", "epoch").orderBy("event_id").collect().toSeq
    assert(Maintenance.foldAged(spark, lake, keepLast = 2) == 3)
    assert(TransactionalLake.committedEpochs(spark, lake) == Seq(3L, 4L))
    assert(TransactionalLake.readCommitted(spark, lake)
      .select("event_id", "payload", "epoch").orderBy("event_id").collect().toSeq == before)
    // nothing aged → no-op; a new commit ages the window forward
    assert(Maintenance.foldAged(spark, lake, keepLast = 2) == 0)
    TransactionalLake.commitEpoch(epochFrame(5L), lake, 5L)
    assert(Maintenance.foldAged(spark, lake, keepLast = 2) == 1)
    assert(TransactionalLake.committedEpochs(spark, lake) == Seq(4L, 5L))
    assert(TransactionalLake.foldState(spark, lake).map(_._2) ==
      Some(Seq(0L, 1L, 2L, 3L)))
  }

  test("scheduled epoch fold converges a growing lake to a bounded manifest") {
    val lake = tmpDir("maint_foldsched")
    (0L to 2L).foreach(e => TransactionalLake.commitEpoch(epochFrame(e), lake, e))
    val handle = Maintenance.scheduleEpochFold(spark, lake, keepLast = 1,
      intervalSeconds = 1L)
    try {
      (3L to 5L).foreach { e =>
        TransactionalLake.commitEpoch(epochFrame(e), lake, e)
        Thread.sleep(200)
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (TransactionalLake.committedEpochs(spark, lake).size > 1 &&
        System.nanoTime() < deadline) Thread.sleep(300)
      assert(TransactionalLake.committedEpochs(spark, lake) == Seq(5L),
        "retention must fold everything but the newest epoch")
      assert(handle.lastFailure.isEmpty, s"fold ticks failed: ${handle.lastFailure}")
      assert(TransactionalLake.readCommitted(spark, lake).count() == 6L)
    } finally handle.close()
  }
}
