package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Ingest observability — parity with the reference's task-level KDA
  * monitoring (`kinesis-stack.ts:188-193`: `MetricsLevel TASK`, INFO
  * logs). Structured Streaming already emits per-batch progress; this
  * listener keeps a bounded in-memory window of the metrics an operator
  * actually watches (rows/s, batch duration, state size) and exposes
  * them as a queryable summary.
  *
  * Scale note: the listener runs on the driver and holds O(window)
  * fixed-size records — no executor cost, no data-plane overhead.
  */
object Monitoring {

  final case class BatchMetric(queryName: String, batchId: Long,
                               inputRows: Long, inputRowsPerSec: Double,
                               processRowsPerSec: Double, durationMs: Long,
                               stateRows: Long)

  /** Bounded-window listener; attach once per session. */
  final class IngestListener(window: Int = 256) extends StreamingQueryListener {
    private val metrics = new ConcurrentLinkedQueue[BatchMetric]()

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryIdle(event: QueryIdleEvent): Unit = ()

    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      val stateRows =
        if (p.stateOperators == null) 0L
        else p.stateOperators.map(_.numRowsTotal).sum
      metrics.add(BatchMetric(
        Option(p.name).getOrElse(p.id.toString), p.batchId,
        p.numInputRows, p.inputRowsPerSecond, p.processedRowsPerSecond,
        p.batchDuration, stateRows))
      while (metrics.size() > window) { metrics.poll(); () }
      ()
    }

    def snapshot: Seq[BatchMetric] = {
      val it = metrics.iterator()
      val b = Seq.newBuilder[BatchMetric]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession, window: Int = 256): IngestListener = {
    val l = new IngestListener(window)
    spark.streams.addListener(l)
    l
  }

  /** The collected window as a DataFrame — metrics are themselves
    * queryable (the SQL-first analog of the CloudWatch dashboard). */
  def metricsTable(spark: SparkSession, listener: IngestListener) = {
    import spark.implicits._
    listener.snapshot.toDF()
  }
}
