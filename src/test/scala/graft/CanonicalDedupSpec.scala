package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CanonicalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components label multi-hop chains with the component min") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val nodes = (1L to 12L).toDF("id")
    val labels = Dedup.connectedComponents(pairs, nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert(labels(12L) == 12L) // isolated node is its own canonical
  }

  test("pointer doubling converges on a 300-hop chain within the default round cap") {
    // one-hop-only propagation would need ~300 rounds here; doubling
    // needs ~log2(300) ≈ 9 — must fit in the default maxIter=10
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 300L).toDF("id")
    val labels = Dedup.connectedComponents(pairs, nodes, "id")
      .as[(Long, Long)].collect()
    assert(labels.forall(_._2 == 0L), "every chain node must reach the min label")
  }

  test("non-convergence raises instead of returning split components") {
    val pairs = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 50L).toDF("id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, nodes, "id", maxIter = 2)
    }
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
