package graft

import graft.streaming.StreamingAggregates
import graft.streaming.StreamingAggregates.{SessionEvent, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): java.sql.Timestamp =
    new java.sql.Timestamp(1704067200000L + min * 60000L) // 2024-01-01T00:00Z + min

  test("watermarked hourly aggregation emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("TenantId", "event_time", "value")
    val agg = StreamingAggregates.hourlyTenantCounts(df, lateness = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("hourly_out").start()
    try {
      in.addData(("t0", ts(5), 1.0), ("t0", ts(20), 2.0), ("t1", ts(40), 3.0))
      q.processAllAvailable()
      // watermark must pass hour 0 end before the window finalizes
      in.addData(("t0", ts(135), 1.0))
      q.processAllAvailable()
      val out = spark.table("hourly_out")
        .select($"TenantId", $"n", $"sum_value").as[(String, Long, Double)]
        .collect().sortBy(_._1)
      assert(out.toSeq == Seq(("t0", 2L, 3.0), ("t1", 1L, 3.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds streaming dedup state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val df = in.toDF().toDF("event_id", "event_time")
    val dedup = StreamingAggregates.dedupWithinWatermark(df, "event_time", Seq("event_id"),
      lateness = "10 minutes")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData((1L, ts(0)), (1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      in.addData((1L, ts(0)), (3L, ts(2)))
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      assert(n == 3, s"expected 3 distinct events, got $n")
    } finally q.stop()
  }

  test("stream-stream interval join matches purchases within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingAggregates.clickToPurchaseJoin(
      clicks.toDF().toDF("click_user", "click_ts"),
      purchases.toDF().toDF("purchase_user", "purchase_ts"),
      windowSec = 1800L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(0)))
      purchases.addData((1L, ts(10)), (2L, ts(40)), (1L, ts(170)))
      q.processAllAvailable()
      val out = spark.table("ssj_out")
        .select($"click_user", $"purchase_ts").collect()
      // user 1: purchase at +10min joins; +170min is outside the 30-min window
      // user 2: purchase at +40min is outside
      assert(out.length == 1 && out.head.getLong(0) == 1L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes sessions after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val sessions = StreamingAggregates.sessionize(in.toDS(), gapSec = 600L,
      lateness = "1 minute")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("session_out").start()
    try {
      // session 1: two events 5 min apart; then a 20-min gap closes it
      in.addData(SessionEvent("t0", 1L, ts(0), 1.0), SessionEvent("t0", 1L, ts(5), 2.0))
      q.processAllAvailable()
      in.addData(SessionEvent("t0", 1L, ts(30), 5.0))
      q.processAllAvailable()
      in.addData(SessionEvent("t0", 1L, ts(90), 7.0)) // advance watermark far
      q.processAllAvailable()
      val out = spark.table("session_out").as[SessionOut].collect()
        .sortBy(_.startEpoch)
      assert(out.length >= 1)
      assert(out.head.nEvents == 2 && out.head.sumValue == 3.0)
    } finally q.stop()
  }

  test("left-outer interval join emission boundary: strictly-past windows only") {
    // Pins the emission rule the pipe_streaming_outer_join oracle encodes
    // (cts + window < watermark, STRICT) on crafted boundary timestamps —
    // the fixture has no click whose window end equals the final
    // watermark, so without this the < vs <= choice would be untested.
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingAggregates.clickToPurchaseJoin(
      clicks.toDF().toDF("click_id", "click_user", "click_ts"),
      purchases.toDF().toDF("purchase_id", "purchase_user", "purchase_ts"),
      lateness = "10 minutes", windowSec = 3600L, joinType = "left_outer")
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("oj_boundary").start()
    try {
      def t(sec: Long): java.sql.Timestamp =
        new java.sql.Timestamp(1704067200000L + sec * 1000L)
      // final watermark will be min(maxClick, maxPurchase) - 600 = 4200.
      // click 1 @ 599: window end 4199 < 4200  → null row EMITTED
      // click 2 @ 600: window end 4200 == 4200 → boundary (strict rule: withheld)
      // click 3 @ 1000: window end 4600 > 4200 → withheld
      // click 4 @ 100 matched by a purchase     → pair emitted
      clicks.addData((1L, 1L, t(599)), (2L, 2L, t(600)), (3L, 3L, t(1000)),
        (4L, 4L, t(100)), (99L, 99L, t(4800)))
      purchases.addData((40L, 4L, t(200)), (98L, 98L, t(4800)))
      q.processAllAvailable()
      // advance both sides' watermarks past the boundary
      clicks.addData((100L, 100L, t(4800)))
      purchases.addData((101L, 101L, t(4800)))
      q.processAllAvailable()
      val out = spark.table("oj_boundary")
        .select($"click_id", $"purchase_id").as[(Long, Option[Long])]
        .collect().toSet
      assert(out.contains((4L, Some(40L))), s"matched pair missing: $out")
      assert(out.contains((1L, None)), s"strictly-past unmatched click not emitted: $out")
      assert(!out.exists(r => r._1 == 2L && r._2.isEmpty),
        s"boundary click (window end == watermark) must stay withheld: $out")
      assert(!out.exists(r => r._1 == 3L && r._2.isEmpty),
        s"open-window click must stay withheld: $out")
    } finally q.stop()
  }
}
