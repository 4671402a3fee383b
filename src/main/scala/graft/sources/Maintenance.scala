package graft.sources

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import org.apache.spark.sql.SparkSession

/** Crawler-cadence catalog maintenance — the analog of the reference's
  * 5-minute Glue crawler cron (`multi-tenant-glue-stack.ts:41-43`,
  * `cron(0/5 * * * ? *)`), for lakes written by EXTERNAL writers.
  *
  * The streaming sink does NOT need this: it registers its own partitions
  * transactionally per micro-batch (StreamingIngest `table` option). This
  * hook covers the reference's other ingestion shape — files landing in
  * the lake path from outside the engine (backfills, copies, a second
  * cluster) — where only a periodic re-crawl can pick them up.
  *
  * Scale note: each tick runs `recoverPartitions`, which is O(table
  * partitions) listing + metastore work — exactly what the Glue crawler
  * pays per crawl. Writers that know their partitions should call
  * `Lake.registerPartitions` instead (O(batch partitions)) and skip the
  * cadence entirely.
  */
object Maintenance {

  /** Handle for a scheduled refresh; close() cancels the cadence. */
  final class RefreshHandle private[Maintenance] (exec: ScheduledExecutorService)
      extends AutoCloseable {
    @volatile private[Maintenance] var ticks: Long = 0L
    @volatile private[Maintenance] var lastError: Option[Throwable] = None
    def tickCount: Long = ticks
    def lastFailure: Option[Throwable] = lastError
    override def close(): Unit = { exec.shutdownNow(); () }
  }

  /** One crawl: register the table if missing; if the merged file schema
    * has DRIFTED from the catalog (columns added by later writers — the
    * crawler's schema-evolution case) re-register so the new columns
    * surface (old files read NULL for them); otherwise just re-infer
    * partitions and invalidate the cached file listing. Idempotent, like
    * a crawler run. The drift check pays a merged-footer inference per
    * tick — crawl-cadence cost, same as a Glue crawl; steady-state
    * writers use `Lake.registerPartitions` and skip this path. */
  def refreshOnce(spark: SparkSession, table: String, path: String): Unit = {
    if (!spark.catalog.tableExists(table)) Lake.registerExternal(spark, table, path)
    else {
      val catalogCols = spark.table(table).schema.fieldNames.toSet
      val inferredCols = spark.read.option("mergeSchema", "true")
        .parquet(path).schema.fieldNames.toSet
      if (inferredCols != catalogCols) Lake.registerExternal(spark, table, path)
      else {
        spark.catalog.recoverPartitions(table)
        spark.catalog.refreshTable(table)
      }
    }
  }

  /** Schedule `refreshOnce` on a fixed cadence (default: the reference
    * crawler's 5 minutes) on a daemon thread. A failing tick is recorded
    * on the handle and the cadence continues — crawler semantics, not a
    * crashing job. */
  def scheduleRefresh(spark: SparkSession, table: String, path: String,
                      intervalSeconds: Long = 300L): RefreshHandle = {
    val exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, s"graft-catalog-refresh-$table")
      t.setDaemon(true)
      t
    }
    val handle = new RefreshHandle(exec)
    exec.scheduleWithFixedDelay(() => {
      try {
        refreshOnce(spark, table, path)
        handle.ticks += 1
        handle.lastError = None // a healthy tick clears a stale failure
      } catch {
        case e: Throwable => handle.lastError = Some(e)
      }
    }, 0L, intervalSeconds, TimeUnit.SECONDS)
    handle
  }
}
