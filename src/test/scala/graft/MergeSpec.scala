package graft

import graft.sources.TransactionalLake
import org.apache.spark.sql.functions._

/** Row-level MERGE (merge-on-read) + CDC feed: resolution order,
  * tombstones, re-insert-after-delete, same-epoch conflict rejection,
  * crash-replay idempotence, and stability across a retention fold.
  * The driver gate (`pipe_merge_upsert` / `pipe_epoch_changes`) proves
  * the composition against DuckDB; these pin each contract in
  * isolation on a corpus small enough to read in the failure message. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def kv(rows: (Long, String)*) = rows.toDF("k", "v")
  private def keys(ks: Long*) = ks.toDF("k")
  private val noDel = keys().filter(lit(false))

  private def resolved(root: String): Map[Long, String] =
    TransactionalLake.readMerged(spark, root, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert overrides, delete tombstones, re-insert revives") {
    val root = tmpDir("merge_basic")
    TransactionalLake.mergeCommit(kv(1L -> "a", 2L -> "b", 3L -> "c"),
      noDel, root, 0L, Seq("k"))
    TransactionalLake.mergeCommit(kv(2L -> "b2"), keys(3L), root, 1L, Seq("k"))
    assert(resolved(root) == Map(1L -> "a", 2L -> "b2"))
    // re-insert the tombstoned key in a later epoch
    TransactionalLake.mergeCommit(kv(3L -> "c3"), noDel, root, 2L, Seq("k"))
    assert(resolved(root) == Map(1L -> "a", 2L -> "b2", 3L -> "c3"))
  }

  test("same-epoch key conflicts are rejected; disabled validation is caller's risk") {
    val root = tmpDir("merge_conflict")
    // upsert + delete of the same key in one epoch: no defined winner
    intercept[IllegalArgumentException] {
      TransactionalLake.mergeCommit(kv(1L -> "a"), keys(1L), root, 0L, Seq("k"))
    }
    // duplicate upsert of the same key in one epoch
    intercept[IllegalArgumentException] {
      TransactionalLake.mergeCommit(kv(1L -> "a", 1L -> "b"), noDel,
        root, 0L, Seq("k"))
    }
    // nothing may have been committed by the rejected epochs
    assert(TransactionalLake.committedEpochs(spark, root).isEmpty)
  }

  test("replayed merge epoch is a no-op (exactly-once under crash replay)") {
    val root = tmpDir("merge_replay")
    TransactionalLake.mergeCommit(kv(1L -> "a"), noDel, root, 0L, Seq("k"))
    TransactionalLake.mergeCommit(kv(1L -> "a1"), noDel, root, 1L, Seq("k"))
    // driver restarts and replays epoch 1 with stale (different) content:
    // the committed epoch must win — replay cannot rewrite history
    TransactionalLake.mergeCommit(kv(1L -> "STALE"), keys(1L), root, 1L,
      Seq("k"), validate = false)
    assert(resolved(root) == Map(1L -> "a1"))
  }

  test("merge resolution and CDC cursors survive a retention fold") {
    val root = tmpDir("merge_fold")
    TransactionalLake.mergeCommit(kv(1L -> "a", 2L -> "b"), noDel, root, 0L, Seq("k"))
    TransactionalLake.mergeCommit(kv(1L -> "a1"), keys(2L), root, 1L, Seq("k"))
    TransactionalLake.mergeCommit(kv(4L -> "d"), noDel, root, 2L, Seq("k"))
    val before = resolved(root)
    val cdcBefore = TransactionalLake.changesBetween(spark, root, 0L, 2L)
      .select("k", TransactionalLake.OpCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(TransactionalLake.foldCommittedEpochs(spark, root, upTo = 1L,
      partitionCols = Nil) == 2)
    assert(resolved(root) == before)
    assert(before == Map(1L -> "a1", 4L -> "d"))
    // a consumer whose cursor predates the fold still gets epoch-1 changes
    val cdcAfter = TransactionalLake.changesBetween(spark, root, 0L, 2L)
      .select("k", TransactionalLake.OpCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(cdcAfter == cdcBefore)
    assert(cdcBefore == Seq((1L, "u"), (2L, "d"), (4L, "u")))
  }

  test("CDC feed carries ops, epochs, and payloads; range is (from, to]") {
    val root = tmpDir("merge_cdc")
    TransactionalLake.mergeCommit(kv(1L -> "a"), noDel, root, 0L, Seq("k"))
    TransactionalLake.mergeCommit(kv(2L -> "b"), keys(1L), root, 1L, Seq("k"))
    val ch = TransactionalLake.changesBetween(spark, root, 0L, 1L)
      .select(col("k"), col("v"), col(TransactionalLake.OpCol),
        col("epoch").cast("long"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2), r.getLong(3))).sorted.toSeq
    // epoch 0 is excluded (cursor semantics), tombstone payload is null
    assert(ch == Seq((1L, None, "d", 1L), (2L, Some("b"), "u", 1L)))
  }
}
