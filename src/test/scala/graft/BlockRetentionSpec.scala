package graft

import graft.operators.{Blocks, Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The zero-residual-storage contract of the iterative operators: a frame
  * returned by connectedComponents / canonicalize / incrementalNearDupPairs
  * / ivfCentroidsRefined pins NO block-manager storage (the final result
  * is copied out to a reliable checkpoint; every round's localCheckpoint
  * blocks are released). In a long-lived session running repeated dedup
  * passes, anything less is monotone executor storage growth — and the
  * bench quiesce barrier's unpersist-all sweep must not be able to
  * invalidate a result it didn't create. */
class BlockRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def residentBlocks: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def sweepAll(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

  test("canonicalize leaves zero persistent RDDs and survives an unpersist-all sweep") {
    sweepAll() // isolate from other suites sharing the session
    val docs = Tables.load(spark, sf0001, "documents")
    val canon = Dedup.canonicalize(docs, "doc_id", "text")
    val n = canon.count()
    assert(n == docs.count())
    assert(residentBlocks == 0,
      s"canonicalize left $residentBlocks persistent RDDs in the block manager")
    // the quiesce-barrier scenario: an external sweep between queries
    // must not destroy a result the operator already returned
    sweepAll()
    assert(canon.count() == n)
  }

  test("repeated canonicalize passes hold zero residual storage") {
    sweepAll()
    val docs = Tables.load(spark, sf0001, "documents")
    (1 to 3).foreach { _ =>
      Dedup.canonicalize(docs, "doc_id", "text").count()
      assert(residentBlocks == 0)
    }
  }

  test("incrementalNearDupPairs leaves zero persistent RDDs") {
    sweepAll()
    val docs = Tables.load(spark, sf0001, "documents")
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val fresh = docs.filter(col("doc_id") % 10 >= 8)
    val pairs = Dedup.incrementalNearDupPairs(fresh, corpus,
      Dedup.minhashBandIndex(corpus, "doc_id", "text"), "doc_id", "text")
    val n = pairs.count()
    assert(residentBlocks == 0,
      s"incremental dedup left $residentBlocks persistent RDDs")
    sweepAll()
    assert(pairs.count() == n) // result survives the sweep
  }

  test("incremental canonicalization fold leaves zero persistent RDDs; map survives a sweep") {
    sweepAll()
    val docs = Tables.load(spark, sf0001, "documents")
    // ngramJaccardPairs is EAGER and already file-backed — used as-is
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
    val emptyMap = docs.select(col("doc_id"), col("doc_id").as("canonical_id"))
      .filter(lit(false))
    val map = Blocks.copyOut(
      Dedup.canonicalizeIncremental(emptyMap, docs, pairs, "doc_id"))
    val n = map.count()
    assert(n == docs.count())
    assert(residentBlocks == 0,
      s"canonicalizeIncremental left $residentBlocks persistent RDDs")
    sweepAll()
    assert(map.count() == n) // the copied-out map survives the sweep
  }

  test("ivfCentroidsRefined leaves zero persistent RDDs") {
    sweepAll()
    val embs = Tables.load(spark, sf0001, "embeddings")
    val cents = Similarity.ivfCentroidsRefined(embs, "vec_id", "embedding",
      nCells = 8, iters = 2)
    assert(cents.count() == 8)
    assert(residentBlocks == 0,
      s"centroid refinement left $residentBlocks persistent RDDs")
  }

  test("copyOut frames read disk, not blocks: release of the source is safe") {
    sweepAll()
    val src = (1L to 100L).toDF("id").localCheckpoint(true)
    assert(residentBlocks == 1)
    val out = Blocks.copyOut(src.select(col("id") * 2 as "x"))
    Blocks.release(src)
    assert(residentBlocks == 0)
    assert(out.agg(sum("x")).as[Long].head() == 10100L)
  }
}
