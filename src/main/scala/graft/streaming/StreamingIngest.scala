package graft.streaming

import graft.ingest.Ingest
import graft.model.Schemas
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingest: the reference's Flink→Firehose chain
  * (SURVEY §3.1) as `readStream → [same batch stages] → writeStream`.
  *
  * Parity points:
  *  - 60 s processing-time trigger ≡ Firehose bufferingHints 60 s
  *    (kinesis-stack.ts:140-142)
  *  - checkpointLocation ≡ Flink checkpointing every 60 s
  *    (kinesis-stack.ts:200-205). Delivery: processed-offset tracking
  *    makes restarts replay-free, but foreachBatch itself is
  *    AT-LEAST-ONCE on mid-batch failure (an epoch that crashed between
  *    data write and checkpoint commit re-appends on replay) — the same
  *    envelope as the reference's Flink→Firehose→S3 chain. Exactly-once
  *    readers dedup on a record key (Dedup.exact) or use a
  *    transactional table format for the sink.
  *  - dynamic partition write tenant/year/month/day/hour ≡ Firehose
  *    dynamic partitioning (kinesis-stack.ts:137-161)
  *  - corrupt/invalid records land under error/<error-type>/ per
  *    micro-batch (S6) — both outputs from ONE pass via foreachBatch.
  *
  * The Flink job is stateless, so micro-batch semantics are a strict
  * superset; no watermark is needed for parity (ingest-time, not
  * event-time — a delayed record lands in a later hour partition,
  * exactly like the reference).
  *
  * Scale: the stage chain is narrow (no shuffle); the only exchange is
  * the optional pre-sink repartition by partition columns that bounds
  * file counts (small-file mitigation, SURVEY §7.4).
  */
object StreamingIngest {

  /** Raw-string stream → enriched, partition-derived stream + error split,
    * written per micro-batch. `tenantFromCol` mirrors C3: the tenant comes
    * from the transport key column, never the payload.
    *
    * `table`: when set, the sink maintains the catalog TRANSACTIONALLY per
    * micro-batch (SURVEY §3.2) — after each commit it registers exactly the
    * batch's partition tuples (incremental ADD PARTITION, O(batch
    * partitions)) so the streamed data is queryable through
    * `spark.table`/`TenantQueries` immediately, with zero crawler lag (the
    * reference needs a 5-min Glue crawl, multi-tenant-glue-stack.ts:41-43).
    * The per-batch `.distinct().collect()` is metadata-scale (tenants ×
    * hours in one batch), never data-scale. */
  def start(spark: SparkSession, raw: DataFrame, rawCol: String,
            tenantCol: String, lakeRoot: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
            ingestTs: Column = unix_timestamp(),
            table: Option[String] = None,
            saltFiles: Int = 1): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.persist()
        try {
          val (valid, errors) = Ingest.validateAndSplit(cached, rawCol)
          // C3: a record whose TRANSPORT tenant key is null cannot be
          // partition-keyed — route it to the error prefix (the analog of
          // a Firehose partition-extraction failure), never to a
          // __HIVE_DEFAULT_PARTITION__ directory.
          val noTenant = valid.filter(col(tenantCol).isNull)
            .select(col(rawCol).as("raw"),
              lit("missing-tenant-key").as(Ingest.ErrorTypeCol))
          val enriched = Ingest.derivePartitions(
            Ingest.enrich(valid.filter(col(tenantCol).isNotNull),
              col(tenantCol), ingestTs))
            .drop(rawCol)
          // saltFiles > 1: a batch concentrated on few (tenant, hour)
          // partitions otherwise serializes behind that many writer
          // tasks (writeValid's hash distribution leaves the rest idle)
          val path = graft.sources.Lake.writeValid(enriched, lakeRoot,
            saltFiles = saltFiles)
          table.foreach { t =>
            val pcols = Schemas.partitionCols
            val parts = enriched.select(pcols.map(col): _*).distinct()
              .collect()
              .map(r => pcols.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap)
              .toSeq
            // catalog ops run on the CALLER's session, not batch
            // .sparkSession: foreachBatch hands a cloned session whose
            // relation cache is isolated — refreshing the clone would
            // leave the session users actually query through stale.
            graft.sources.Lake.registerPartitions(spark, t, path, parts,
              schema = Some(enriched.schema))
          }
          val allErrors = errors.unionByName(noTenant)
          if (!allErrors.isEmpty) {
            graft.sources.Lake.writeErrors(allErrors, lakeRoot)
            // dead letters are SQL-queryable like the data (the crawler
            // indexes the whole bucket in the reference). INCREMENTAL
            // registration of the batch's error types only — a full
            // re-crawl here would DROP+CREATE `<table>_errors` on every
            // errored batch (transient missing-table window mid-stream)
            // and pay O(error-prefix partitions) per batch. The distinct
            // collect is metadata-scale (error types in one batch).
            table.foreach { t =>
              val types = allErrors.select(Ingest.ErrorTypeCol).distinct()
                .collect().map(_.getString(0)).toSeq
              graft.sources.Lake.registerErrorPartitions(spark, t, lakeRoot, types)
            }
          }
          ()
        } finally { cached.unpersist(); () }
      }
      .start()

  /** EXACTLY-ONCE variant of [[start]]: each epoch's valid rows are
    * delivered through [[graft.sources.TransactionalLake.commitEpoch]] —
    * idempotent epoch-directory overwrite + atomic manifest publish — so
    * a replayed epoch (crash between data write and checkpoint commit,
    * the at-least-once hazard of the append path) rewrites its own
    * directory or skips, never duplicates. Readers use
    * `TransactionalLake.readCommitted`. Dead letters keep the append
    * path (diagnostics: replay may re-log an error, it cannot corrupt
    * the data). Catalog registration is the reader's `readCommitted`
    * view rather than per-partition ALTERs — epoch dirs come and go with
    * the replay window, the manifest is the source of truth. */
  def startTransactional(spark: SparkSession, raw: DataFrame, rawCol: String,
                         tenantCol: String, lakeRoot: String, checkpoint: String,
                         trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
                         ingestTs: Column = unix_timestamp(),
                         onEpochCommitted: (SparkSession, Long) => Unit =
                           (_, _) => ()): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val cached = batch.persist()
        try {
          val (valid, errors) = Ingest.validateAndSplit(cached, rawCol)
          val noTenant = valid.filter(col(tenantCol).isNull)
            .select(col(rawCol).as("raw"),
              lit("missing-tenant-key").as(Ingest.ErrorTypeCol))
          val enriched = Ingest.derivePartitions(
            Ingest.enrich(valid.filter(col(tenantCol).isNotNull),
              col(tenantCol), ingestTs))
            .drop(rawCol)
          graft.sources.TransactionalLake.commitEpoch(enriched, lakeRoot, epochId)
          // post-commit hook — e.g. MaterializedView.refresh for
          // continuous incremental view maintenance. Runs AFTER the
          // epoch is durable; a crash between commit and hook replays
          // the epoch as a no-op and re-fires the hook, so the hook
          // must be (and MaterializedView.refresh is) idempotent.
          onEpochCommitted(batch.sparkSession, epochId)
          val allErrors = errors.unionByName(noTenant)
          if (!allErrors.isEmpty) {
            graft.sources.Lake.writeErrors(allErrors, lakeRoot); ()
          }
          ()
        } finally { cached.unpersist(); () }
      }
      .start()

  /** Start a query via `mk` and await termination, retrying (bounded) on
    * the one same-JVM restart race: a terminated query releases its
    * in-memory checkpoint lock asynchronously, so an immediate restart on
    * the same checkpoint can see "concurrently using". Real crash
    * recovery restarts a fresh driver and never hits this; the retry
    * exists for crash-SIMULATING harnesses (the delivery-semantics gates
    * and specs) that restart within one JVM. */
  def awaitWithRestartRetry(mk: () => StreamingQuery,
                            maxAttempts: Int = 40): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      val q = mk()
      try { q.awaitTermination(); done = true }
      catch {
        case e: Throwable if attempts < maxAttempts &&
          Option(e.getMessage).exists(_.contains("concurrently using")) =>
          attempts += 1; Thread.sleep(250)
      }
    }
  }

  /** File-source variant: watch a directory of JSON-lines files — the test
    * and local-smoke entry point (README §1.1 payload shape). */
  def fromJsonDir(spark: SparkSession, inDir: String, tenantCol: String,
                  lakeRoot: String, checkpoint: String,
                  trigger: Trigger,
                  table: Option[String] = None): StreamingQuery = {
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(tenantCol,
          org.apache.spark.sql.types.StringType))))
      .json(inDir)
    start(spark, raw, "value", tenantCol, lakeRoot, checkpoint, trigger,
      table = table)
  }
}
