package graft.streaming

import graft.operators.Dedup
import graft.sources.TransactionalLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING incremental near-dup dedup — the deployment integration of
  * `Dedup.incrementalNearDupPairs` (which `dedup_incremental_fold`
  * models as a batch loop): every arriving micro-batch of documents is
  * deduped against everything ingested before it, and three persistent,
  * transactionally-committed artifacts accumulate per epoch:
  *
  * {{{
  *   root/corpus/...   the raw documents          (epoch-committed)
  *   root/index/...    their MinHash band index   (epoch-committed)
  *   root/pairs/...    the near-dup pair log      (epoch-committed)
  * }}}
  *
  * Per batch, the existing corpus is touched ONLY through its
  * precomputed band index (collision join) plus the broadcast-pruned
  * candidate fetch — never re-shingled, never re-signed; the batch's
  * own index is computed once and becomes the next epoch's increment.
  * At 100 TB-of-corpus this is the crawl-ingest shape: per-batch cost
  * scales with the batch and its collisions, not the corpus.
  *
  * EXACTLY-ONCE: each artifact commits through the
  * [[TransactionalLake]] idempotent-epoch protocol, and the reads that
  * feed a batch's computation EXCLUDE the batch's own epoch id — so a
  * crash-replayed epoch recomputes from the same pre-batch state,
  * rewrites the same directories, and the pair log never duplicates.
  * The union of the committed pair-log epochs equals the ONE-SHOT
  * near-dup pairs of the full corpus (every pair has a later-arriving
  * side; set equality is batching-independent) — which is exactly what
  * the driver gate's plain-SQL oracle checks.
  */
object StreamingDedup {

  def corpusRoot(root: String): String = s"$root/corpus"
  def indexRoot(root: String): String = s"$root/index"
  def pairsRoot(root: String): String = s"$root/pairs"

  /** Start the dedup stage over a streaming `docs` frame carrying
    * (`idCol`, `textCol`). */
  def start(docs: DataFrame, idCol: String, textCol: String, root: String,
            checkpoint: String, trigger: Trigger, k: Int = 3,
            threshold: Double = 0.8, bands: Int = 16,
            rowsPerBand: Int = 4): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession // the cloned micro-batch session
        // micro-delta mode for the whole batch body: a micro-batch's
        // dedup work reads the batch (file-source plan stats = real
        // bytes) + the prior artifacts (file metadata); at lake-scale
        // session settings each sub-step is scheduler-dispatch-bound.
        // The cloned session isolates the conf flip to this stream.
        val batchBytes = batch.queryExecution.optimizedPlan.stats.sizeInBytes
          .min(BigInt(Long.MaxValue)).toLong
        val inputBytes = batchBytes +
          Seq(corpusRoot(root), indexRoot(root), pairsRoot(root))
            .map(graft.sources.MaintenanceExec.dirFootprintBytes(s, _)).sum
        graft.sources.MaintenanceExec.sizedByBytes(s, inputBytes) {
        // pre-batch state: committed epochs EXCLUDING a half-committed
        // copy of THIS epoch (crash replay must recompute from the same
        // inputs it saw the first time)
        def priorRead(r: String): Option[DataFrame] = {
          // prior state lives in live epoch dirs AND (after retention)
          // the consolidated fold generation — consult both
          val live = TransactionalLake.committedEpochs(s, r).filter(_ != epochId)
          val folded = TransactionalLake.foldState(s, r)
            .map(_._2).getOrElse(Seq.empty).filter(_ != epochId)
          if (live.isEmpty && folded.isEmpty) None
          else Some(TransactionalLake.readCommitted(s, r)
            .filter(col("epoch") =!= epochId.toString).drop("epoch"))
        }
        val batchIndex = Dedup.minhashBandIndex(batch, idCol, textCol,
          k, bands, rowsPerBand)
        val emptyIndex = Dedup.minhashBandIndex(batch.filter(lit(false)),
          idCol, textCol, k, bands, rowsPerBand)
        val pairs = Dedup.incrementalNearDupPairs(
          batch,
          priorRead(corpusRoot(root)).getOrElse(batch.filter(lit(false))),
          priorRead(indexRoot(root)).getOrElse(emptyIndex),
          idCol, textCol, k, threshold, bands, rowsPerBand,
          newIndex = Some(batchIndex))
        // corpus and index first, the pair log LAST: the pair epoch is
        // the consumer-visible commit point, and every artifact commit
        // is individually idempotent
        TransactionalLake.commitEpoch(batch, corpusRoot(root), epochId, Nil)
        TransactionalLake.commitEpoch(batchIndex, indexRoot(root), epochId, Nil)
        TransactionalLake.commitEpoch(pairs, pairsRoot(root), epochId, Nil)
        }
        ()
      }
      .start()

  /** The accumulated near-dup pair log (exactly-once across replays). */
  def pairLog(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    TransactionalLake.readCommitted(spark, pairsRoot(root)).drop("epoch")

  def canonicalRoot(root: String): String = s"$root/canonical"

  /** POST-COMMIT canonical-map maintenance — the incremental path that
    * keeps "which doc is the canonical representative" current WITHOUT
    * re-canonicalizing the corpus: every committed pair-log epoch not yet
    * applied advances the persisted (id → canonical_id) map by a
    * [[Dedup.canonicalizeIncrementalDelta]] — per epoch that is
    * O(batch + touched components) work and an O(changes)-row delta
    * commit, never an O(corpus) rewrite. Run after a stream run or at
    * maintenance cadence (like [[foldAged]]); never concurrently with
    * itself.
    *
    * EXACTLY-ONCE: each delta commits through the idempotent
    * [[TransactionalLake]] epoch protocol under `root/canonical`, keyed
    * by the SAME epoch id as the pair-log epoch it consumes; an epoch's
    * inputs (prior map state, the epoch's corpus slice and pairs) are
    * all reads of already-committed artifacts below it, so a crash
    * mid-maintenance resumes by skipping the committed prefix and a
    * re-delivered pair epoch contracts to an empty delta
    * (StreamingDedupSpec). Returns the epoch ids applied this call. */
  def maintainCanonical(spark: org.apache.spark.sql.SparkSession, root: String,
                        idCol: String): Seq[Long] = {
    val croot = canonicalRoot(root)
    val done = TransactionalLake.committedEpochs(spark, croot).toSet ++
      TransactionalLake.foldState(spark, croot).map(_._2).getOrElse(Seq.empty)
    val pairEpochs = (TransactionalLake.committedEpochs(spark, pairsRoot(root)) ++
      TransactionalLake.foldState(spark, pairsRoot(root)).map(_._2).getOrElse(Seq.empty))
      .distinct.sorted
    val todo = pairEpochs.filterNot(done)
    // each epoch's delta maintenance reads: the pair/corpus rows of THIS
    // epoch (partition-pruned) + the whole canonical map (the as-of
    // window) — size its shuffles to that footprint (micro-delta mode:
    // a per-epoch map advance is scheduler-dispatch-bound at lake-scale
    // settings; a map outgrowing the budget keeps them untouched)
    def epochFootprint(e: Long): Long =
      TransactionalLake.changeFootprintBytes(spark, pairsRoot(root), e - 1, e) +
        TransactionalLake.changeFootprintBytes(spark, corpusRoot(root), e - 1, e) +
        TransactionalLake.changeFootprintBytes(spark, croot, -1L, Long.MaxValue)
    todo.foreach { e =>
      graft.sources.MaintenanceExec.sizedByBytes(spark, epochFootprint(e)) {
      val newDocs = TransactionalLake.readCommitted(spark, corpusRoot(root))
        .filter(col("epoch").cast("long") === e).select(col(idCol))
      val pairs = TransactionalLake.readCommitted(spark, pairsRoot(root))
        .filter(col("epoch").cast("long") === e).drop("epoch")
      // prior map state = latest-wins over the delta epochs BELOW this
      // one (so a resumed maintenance pass sees exactly the state the
      // first attempt saw); before any canonical epoch exists the prior
      // map is empty
      val anyPrior = (TransactionalLake.committedEpochs(spark, croot) ++
        TransactionalLake.foldState(spark, croot).map(_._2).getOrElse(Seq.empty))
        .exists(_ < e)
      val prev =
        if (anyPrior) canonicalMapAsOf(spark, root, idCol, e - 1)
        else newDocs.select(col(idCol), col(idCol).as("canonical_id"))
          .filter(lit(false))
      val delta = Dedup.canonicalizeIncrementalDelta(prev, newDocs, pairs, idCol)
      TransactionalLake.commitEpoch(delta, croot, e, Nil)
      }
    }
    todo
  }

  /** The maintained (id → canonical_id) map: latest-entry-wins over the
    * committed delta epochs. Docs with no near-dup carry their own id.
    * The read is one window shuffle keyed on the id — the O(corpus-map)
    * cost lives HERE (a view consumers pay when they ask), never in the
    * per-epoch maintenance write path. */
  def canonicalMap(spark: org.apache.spark.sql.SparkSession,
                   root: String, idCol: String): DataFrame =
    canonicalMapAsOf(spark, root, idCol, Long.MaxValue)

  private def canonicalMapAsOf(spark: org.apache.spark.sql.SparkSession,
                               root: String, idCol: String,
                               epoch: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("epoch").cast("long").desc)
    TransactionalLake.readCommitted(spark, canonicalRoot(root))
      .filter(col("epoch").cast("long") <= epoch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "epoch")
  }

  def quarantineRoot(root: String): String = s"$root/quarantine"

  /** STREAMING DECONTAMINATION — the ingest-time twin of
    * `Dedup.decontaminate`: every arriving micro-batch is checked for
    * word-k-gram overlap against a STATIC benchmark/eval set, and the
    * flagged doc ids accumulate in a transactionally-committed
    * quarantine log (training jobs anti-join against it). Flagging is
    * per-doc against fixed eval postings — no cross-epoch state — so a
    * crash-replayed epoch recomputes identical rows and the idempotent
    * epoch commit keeps the log exactly-once; the committed union
    * equals the one-shot batch decontamination of everything ingested
    * (the driver gate's oracle). The eval postings broadcast per batch:
    * per-batch cost scales with the batch, never the corpus. */
  def startDecontaminate(docs: DataFrame, evalSet: DataFrame, idCol: String,
                         textCol: String, root: String, checkpoint: String,
                         trigger: Trigger, k: Int = 8): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // eval suite is static and broadcast-sized by construction here;
        // pinning the path skips decontaminate's auto-select count job
        // that would otherwise run once per micro-batch
        val flagged = Dedup.decontaminate(batch, evalSet, idCol, textCol, k,
          broadcastEval = Some(true))
        TransactionalLake.commitEpoch(flagged, quarantineRoot(root), epochId, Nil)
        ()
      }
      .start()

  /** The accumulated quarantine log (exactly-once across replays). */
  def quarantineLog(spark: org.apache.spark.sql.SparkSession,
                    root: String): DataFrame =
    TransactionalLake.readCommitted(spark, quarantineRoot(root)).drop("epoch")

  def fuzzyQuarantineRoot(root: String): String = s"$root/quarantine_fuzzy"

  /** STREAMING FUZZY decontamination — the paraphrase-catching twin of
    * [[startDecontaminate]]: every micro-batch runs the MinHash-banded
    * cross-set pass ([[Dedup.decontaminateFuzzy]]) against the static
    * eval suite and commits the verified `(train_id, eval_id, jaccard)`
    * pairs under the batch epoch. Each train doc arrives in exactly one
    * batch and candidates always pair a batch doc with an eval doc, so
    * the accumulated log equals the one-shot fuzzy pass over everything
    * ingested — exactly-once across crash replays via the idempotent
    * epoch commit. Per-batch cost: one batch-scale signature pass plus
    * the suite-scale (broadcast) eval side — never a corpus re-scan. */
  def startDecontaminateFuzzy(docs: DataFrame, evalSet: DataFrame,
                              idCol: String, textCol: String, root: String,
                              checkpoint: String, trigger: Trigger,
                              k: Int = 3, threshold: Double = 0.5,
                              bands: Int = 32,
                              rowsPerBand: Int = 2): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val flagged = Dedup.decontaminateFuzzy(batch, evalSet, idCol,
          textCol, k, threshold, bands, rowsPerBand)
        TransactionalLake.commitEpoch(flagged, fuzzyQuarantineRoot(root),
          epochId, Nil)
        ()
      }
      .start()

  /** The accumulated fuzzy quarantine log (exactly-once across
    * replays). */
  def fuzzyQuarantineLog(spark: org.apache.spark.sql.SparkSession,
                         root: String): DataFrame =
    TransactionalLake.readCommitted(spark, fuzzyQuarantineRoot(root))
      .drop("epoch")

  /** STREAMING substring-dedup index maintenance: every micro-batch
    * advances the gram-postings lake and the per-doc best-repeat state
    * through [[Dedup.commitSubstringBatch]] — both commits are keyed on
    * the micro-batch epoch, so a crash-replayed batch recomputes from
    * the identical committed state (the grams epoch read INCLUDES the
    * batch's own, already-idempotent epoch) and rewrites the same
    * directories: the served answer stays exactly the one-shot
    * [[Dedup.longestDupSubstrings]] of everything ingested. Micro-delta
    * execution sizing, like the near-dup stream: per-batch cost scales
    * with the batch and its gram collisions, never the corpus scan. */
  def startSubstringIndex(docs: DataFrame, idCol: String, textCol: String,
                          root: String, checkpoint: String, trigger: Trigger,
                          minWords: Int = 8,
                          maxAnchorPairs: Long = 10000000L): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession
        val batchBytes = batch.queryExecution.optimizedPlan.stats.sizeInBytes
          .min(BigInt(Long.MaxValue)).toLong
        val inputBytes = batchBytes +
          graft.sources.MaintenanceExec.dirFootprintBytes(s, root)
        graft.sources.MaintenanceExec.sizedByBytes(s, inputBytes) {
          Dedup.commitSubstringBatch(batch, idCol, textCol, root, epochId,
            minWords, maxAnchorPairs)
        }
        ()
      }
      .start()

  def graphMetricsRoot(root: String): String = s"$root/graphmetrics"

  /** POST-COMMIT incremental GRAPH-METRIC maintenance — the graph twin
    * of [[maintainCanonical]]: every committed pair-log epoch not yet
    * applied advances maintained per-node (degree, tri_count) by a
    * [[graft.operators.Graph.incrementalTrianglesDelta]] — per epoch
    * that is O(batch edges · avg degree) work and an O(touched
    * nodes)-row delta commit, never a re-enumeration of the pair
    * graph. Same exactly-once shape: deltas commit under the SAME
    * epoch id as the pair epoch they consume, inputs are
    * already-committed artifacts strictly below it, a re-delivered
    * epoch is skipped by the committed-set check. Returns the epoch
    * ids applied this call. */
  def maintainGraphMetrics(spark: org.apache.spark.sql.SparkSession,
                           root: String): Seq[Long] = {
    import org.apache.spark.sql.functions.{greatest, least}
    val groot = graphMetricsRoot(root)
    val done = TransactionalLake.committedEpochs(spark, groot).toSet ++
      TransactionalLake.foldState(spark, groot).map(_._2).getOrElse(Seq.empty)
    val pairEpochs = (TransactionalLake.committedEpochs(spark, pairsRoot(root)) ++
      TransactionalLake.foldState(spark, pairsRoot(root)).map(_._2).getOrElse(Seq.empty))
      .distinct.sorted
    val todo = pairEpochs.filterNot(done)
    var applied = done
    todo.foreach { e =>
      val pairsAll = TransactionalLake.readCommitted(spark, pairsRoot(root))
      val batch = pairsAll.filter(col("epoch").cast("long") === e)
        .select(col("id_a"), col("id_b"))
      val prevEdges = pairsAll.filter(col("epoch").cast("long") < e)
        .select(least(col("id_a"), col("id_b")).as("u"),
          greatest(col("id_a"), col("id_b")).as("v"))
        .distinct()
      // derivable from the entry scan + this call's own progress — no
      // per-epoch re-listing of the metric lake (listings are the
      // expensive op on object stores)
      val anyPrior = applied.exists(_ < e)
      val prevState =
        if (anyPrior) graphMetricStateAsOf(spark, root, e - 1)
        else batch.select(col("id_a").as("id"))
          .withColumn("degree", lit(0L)).withColumn("tri_count", lit(0L))
          .filter(lit(false))
      val delta = graft.operators.Graph.incrementalTrianglesDelta(
        prevState, prevEdges, batch, "id_a", "id_b")
      TransactionalLake.commitEpoch(delta, groot, e, Nil)
      applied = applied + e
    }
    todo
  }

  /** The maintained per-node (id, degree, tri_count): latest-entry-wins
    * over the committed delta epochs — the O(state) read consumers pay
    * when they ask, never the per-epoch maintenance write path (same
    * contract as [[canonicalMap]]). */
  def graphMetricState(spark: org.apache.spark.sql.SparkSession,
                       root: String): DataFrame =
    graphMetricStateAsOf(spark, root, Long.MaxValue)

  private def graphMetricStateAsOf(spark: org.apache.spark.sql.SparkSession,
                                   root: String, epoch: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("epoch").cast("long").desc)
    val all = TransactionalLake.readCommitted(spark, graphMetricsRoot(root))
    all.filter(col("epoch").cast("long") <= epoch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "epoch")
  }

  /** Retention for the stage's artifact lakes — they gain one epoch per
    * micro-batch forever otherwise: fold all but the newest `keepLast`
    * epochs of corpus, index, pair log, and (when the decontamination
    * stage ran) the quarantine log into their consolidated generations
    * (views unchanged, replay of a folded epoch stays a no-op — same
    * protocol as the event lake). Returns epochs folded per artifact
    * (corpus, index, pairs, quarantine); an artifact that never existed
    * folds 0. Run at maintenance cadence, e.g.
    * `Maintenance.scheduleEpochFold`-style, never concurrently with
    * itself. Returns a named [[FoldedEpochs]] so adding a future
    * artifact lake extends the result instead of breaking every caller
    * destructuring a tuple shape. */
  def foldAged(spark: org.apache.spark.sql.SparkSession, root: String,
               keepLast: Int): FoldedEpochs =
    FoldedEpochs(
      graft.sources.Maintenance.foldAged(spark, corpusRoot(root), keepLast, Nil),
      graft.sources.Maintenance.foldAged(spark, indexRoot(root), keepLast, Nil),
      graft.sources.Maintenance.foldAged(spark, pairsRoot(root), keepLast, Nil),
      graft.sources.Maintenance.foldAged(spark, quarantineRoot(root), keepLast, Nil),
      // the canonical-delta lake folds too (latest-wins is epoch-keyed
      // and a fold preserves per-row epoch values, so the map view and
      // maintainCanonical's done-set both survive retention)
      graft.sources.Maintenance.foldAged(spark, canonicalRoot(root), keepLast, Nil))
}

/** Epochs folded per streaming-dedup artifact lake by
  * [[StreamingDedup.foldAged]]. */
case class FoldedEpochs(corpus: Int, index: Int, pairs: Int, quarantine: Int,
                        canonical: Int = 0)
