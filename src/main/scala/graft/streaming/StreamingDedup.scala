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
        ()
      }
      .start()

  /** The accumulated near-dup pair log (exactly-once across replays). */
  def pairLog(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    TransactionalLake.readCommitted(spark, pairsRoot(root)).drop("epoch")

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
      graft.sources.Maintenance.foldAged(spark, quarantineRoot(root), keepLast, Nil))
}

/** Epochs folded per streaming-dedup artifact lake by
  * [[StreamingDedup.foldAged]]. */
case class FoldedEpochs(corpus: Int, index: Int, pairs: Int, quarantine: Int)
