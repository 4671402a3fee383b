package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators beyond the reference's stateless chain
  * (planned extensions, SURVEY §2.3 "Streaming stateful ops"):
  * watermarked windowed aggregation, streaming dedup, and custom session
  * state via flatMapGroupsWithState.
  *
  * Scale notes: all state is keyed and bounded — watermarks evict window
  * state; dropDuplicatesWithinWatermark bounds the dedup set; session
  * state carries one (start, last, count) triple per active key and times
  * out with the watermark (SURVEY §7.4: bound state per tenant or it
  * grows without limit).
  */
object StreamingAggregates {

  /** Hourly per-tenant counts with a watermark: late records beyond the
    * delay are dropped deterministically rather than growing state. */
  def hourlyTenantCounts(enriched: DataFrame, tsCol: String = "event_time",
                         lateness: String = "1 hour"): DataFrame =
    enriched
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col("TenantId"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("TenantId"), col("n"), col("sum_value"))

  /** Streaming exact dedup with bounded state: duplicates arriving within
    * the watermark window are dropped. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, keyCols: Seq[String],
                           lateness: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join: click events joined to purchase events
    * of the same user within `windowSec` AFTER the click. Both sides are
    * watermarked so the join state is bounded: a buffered click can be
    * dropped once the purchase-side watermark passes click.ts+window. */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                          lateness: String = "10 minutes",
                          windowSec: Long = 3600L,
                          joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("click_ts", lateness)
    val p = purchases.withWatermark("purchase_ts", lateness)
    // LEFT OUTER is watermark-driven: an unmatched click emits its null
    // row only once the GLOBAL watermark (min of both sides) passes the
    // end of its match window — bounded state, deterministic emission;
    // clicks whose window is still open at end-of-stream stay withheld.
    c.join(p,
      col("click_user") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSec SECONDS"),
      joinType)
  }

  case class SessionEvent(tenant: String, userId: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sumValue: Double)
  case class SessionOut(tenant: String, userId: Long, startEpoch: Long,
                        endEpoch: Long, nEvents: Long, sumValue: Double)

  /** Custom keyed state: per (tenant,user) sessions closed after `gapSec`
    * of inactivity (event-time timeout follows the watermark). Emits one
    * row per closed session. */
  def sessionize(events: Dataset[SessionEvent], gapSec: Long = 1800L,
                 lateness: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(e => (e.tenant, e.userId))
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((tenant, userId), rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(tenant, userId, s.start, s.last, s.n, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.last <= gapSec =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sumValue + e.value))
                case Some(s) =>
                  closed ::= SessionOut(tenant, userId, s.start, s.last, s.n, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last * 1000 + gapSec * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
