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
                      intervalSeconds: Long = 300L): RefreshHandle =
    schedule(s"graft-catalog-refresh-$table") { () =>
      refreshOnce(spark, table, path)
    }(intervalSeconds)

  /** One retention pass over a transactional lake: fold every committed
    * epoch EXCEPT the newest `keepLast` into the consolidated generation
    * (see `TransactionalLake.foldCommittedEpochs`). The replay window
    * only ever re-delivers the epoch in flight, so even `keepLast = 1`
    * is correct — keep more for operational headroom (inspection,
    * ad-hoc per-epoch reads). Returns the number of epochs folded. */
  def foldAged(spark: SparkSession, root: String, keepLast: Int,
               partitionCols: Seq[String] = graft.model.Schemas.partitionCols): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val epochs = TransactionalLake.committedEpochs(spark, root)
    if (epochs.size <= keepLast) 0
    else TransactionalLake.foldCommittedEpochs(spark, root,
      upTo = epochs(epochs.size - keepLast - 1), partitionCols = partitionCols)
  }

  /** Scheduled retention for a transactional lake — the fold twin of
    * [[scheduleRefresh]]: at a 60 s trigger the manifest gains ~1,440
    * epochs/day, so a daily-ish fold cadence keeps reader listing cost
    * and manifest size flat forever. Single-writer by construction (one
    * daemon thread per handle); do not schedule two folders over one
    * root. */
  def scheduleEpochFold(spark: SparkSession, root: String, keepLast: Int = 60,
                        intervalSeconds: Long = 3600L): RefreshHandle =
    schedule(s"graft-epoch-fold") { () =>
      foldAged(spark, root, keepLast); ()
    }(intervalSeconds)

  private def schedule(threadName: String)(tick: () => Unit)(
      intervalSeconds: Long): RefreshHandle = {
    val exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, threadName)
      t.setDaemon(true)
      t
    }
    val handle = new RefreshHandle(exec)
    exec.scheduleWithFixedDelay(() => {
      try {
        tick()
        handle.ticks += 1
        handle.lastError = None // a healthy tick clears a stale failure
      } catch {
        case e: Throwable => handle.lastError = Some(e)
      }
    }, 0L, intervalSeconds, TimeUnit.SECONDS)
    handle
  }
}
