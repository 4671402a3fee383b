package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CanonicalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components label multi-hop chains with the component min") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val nodes = (1L to 12L).toDF("id")
    // both paths — the driver union-find fast path (default budget) and
    // the distributed doubling loop (budget 0) — must agree exactly
    Seq(100000L, 0L).foreach { budget =>
      val labels = Dedup.connectedComponents(pairs, nodes, "id",
        driverMaxEdges = budget)
        .as[(Long, Long)].collect().toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L), s"budget=$budget")
      assert(labels(10L) == 10L && labels(11L) == 10L, s"budget=$budget")
      assert(labels(12L) == 12L, s"budget=$budget") // isolated node
    }
  }

  test("pointer doubling converges on a 300-hop chain within the default round cap") {
    // one-hop-only propagation would need ~300 rounds here; doubling
    // needs ~log2(300) ≈ 9 — must fit in the default maxIter=10.
    // driverMaxEdges = 0 forces the DISTRIBUTED loop (the small fixture
    // would otherwise take the driver fast path and prove nothing).
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 300L).toDF("id")
    val labels = Dedup.connectedComponents(pairs, nodes, "id",
      driverMaxEdges = 0L)
      .as[(Long, Long)].collect()
    assert(labels.forall(_._2 == 0L), "every chain node must reach the min label")
  }

  test("non-convergence raises instead of returning split components") {
    val pairs = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 50L).toDF("id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, nodes, "id", maxIter = 2,
        driverMaxEdges = 0L)
    }
  }

  test("incremental canonicalization fold equals one-shot canonicalize") {
    val docs = Tables.load(spark, sf0001, "documents")
    val oneShot = Dedup.canonicalize(docs, "doc_id", "text")
      .as[(Long, Long)].collect().sorted
    val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    val empty = docs.filter(lit(false))
    val emptyMap = docs.select(col("doc_id"), col("doc_id").as("canonical_id"))
      .filter(lit(false))
    val (_, _, folded) = batches.foldLeft(
      (empty, Dedup.minhashBandIndex(empty, "doc_id", "text"), emptyMap)) {
      case ((corpus, index, prevMap), batch) =>
        val batchIndex = Dedup.minhashBandIndex(batch, "doc_id", "text")
        val pairs = Dedup.incrementalNearDupPairs(batch, corpus, index,
          "doc_id", "text", newIndex = Some(batchIndex))
        (corpus.unionByName(batch),
          graft.operators.Blocks.copyOut(index.unionByName(batchIndex)),
          graft.operators.Blocks.copyOut(
            Dedup.canonicalizeIncremental(prevMap, batch, pairs, "doc_id")))
    }
    assert(folded.as[(Long, Long)].collect().sorted.toSeq == oneShot.toSeq,
      "folding 3 batches through canonicalizeIncremental must equal one-shot canonicalize")
  }

  test("re-delivered batch is a no-op: full map unchanged, delta empty") {
    val docsSeq = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely unrelated text about spark catalyst optimizer rules"))
    val docs = docsSeq.toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
    val emptyMap = docs.select(col("doc_id"), col("doc_id").as("canonical_id"))
      .filter(lit(false))
    val map1 = graft.operators.Blocks.copyOut(
      Dedup.canonicalizeIncremental(emptyMap, docs, pairs, "doc_id"))
    assert(map1.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // the SAME batch + pairs re-delivered against the committed map:
    // all ids hit prevMap, all pairs contract to self-pairs
    val map2 = Dedup.canonicalizeIncremental(map1, docs, pairs, "doc_id")
    assert(map2.as[(Long, Long)].collect().toMap ==
      map1.as[(Long, Long)].collect().toMap, "re-delivery must not change the map")
    val delta = Dedup.canonicalizeIncrementalDelta(map1, docs, pairs, "doc_id")
    assert(delta.count() == 0L, "re-delivered batch must produce an empty delta")
  }

  test("delta form: latest-entry-wins fold of deltas equals the full map") {
    val b1 = Seq((1L, "aa bb cc dd ee ff gg hh"), (5L, "zz yy xx ww vv uu tt ss"))
      .toDF("doc_id", "text")
    val b2 = Seq((3L, "aa bb cc dd ee ff gg hh ii")).toDF("doc_id", "text")
    val emptyMap = b1.select(col("doc_id"), col("doc_id").as("canonical_id"))
      .filter(lit(false))
    val p1 = Dedup.ngramJaccardPairs(b1, "doc_id", "text", threshold = 0.5)
    val d1 = graft.operators.Blocks.copyOut(
      Dedup.canonicalizeIncrementalDelta(emptyMap, b1, p1, "doc_id"))
    val map1 = d1 // first epoch: delta IS the map
    // batch 2 joins doc 3 to doc 1's component (jaccard(1,3) >= 0.5):
    // the delta must carry the NEW entry only (3 -> 1); 1's own label
    // is already 1 (the component min), so no prior entry changes
    val p2 = Dedup.incrementalNearDupPairs(b2, b1,
      Dedup.minhashBandIndex(b1, "doc_id", "text"), "doc_id", "text",
      threshold = 0.5)
    val d2 = graft.operators.Blocks.copyOut(
      Dedup.canonicalizeIncrementalDelta(map1, b2, p2, "doc_id"))
    val full2 = Dedup.canonicalizeIncremental(map1, b2, p2, "doc_id")
      .as[(Long, Long)].collect().toMap
    // latest-wins fold of the two deltas == the full map
    val foldedMap = d1.as[(Long, Long)].collect().toMap ++
      d2.as[(Long, Long)].collect().toMap
    assert(foldedMap == full2)
    assert(full2 == Map(1L -> 1L, 5L -> 5L, 3L -> 1L))
  }

  test("pair endpoint outside prevMap and newDocs fails loud") {
    val docs = Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val emptyMap = docs.select(col("doc_id"), col("doc_id").as("canonical_id"))
      .filter(lit(false))
    val rogue = Seq((1L, 99L)).toDF("id_a", "id_b") // 99 never ingested
    val ex = intercept[Exception] {
      Dedup.canonicalizeIncremental(emptyMap, docs, rogue, "doc_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("neither prevMap nor newDocs")),
      s"expected the endpoint guard, got: $ex")
  }

  test("canonicalize keeps exactly one representative per near-dup cluster") {
    val docs = Tables.load(spark, sf0001, "documents")
    val canon = Dedup.canonicalize(docs, "doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val total = docs.count()
    val kept = canon.filter(col("doc_id") === col("canonical_id")).count()
    // reference union-find: kept representatives == connected components
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val mergedAway = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .count(x => find(x) != x)
    assert(kept == total - mergedAway)
    // both members of each pair share a canonical id
    val labels = canon.as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) => assert(labels(a) == labels(b)) }
  }
}
