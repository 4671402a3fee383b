package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** [[Dedup.weightedJaccardPairs]] — exact multiset Jaccard: blocked ≡
  * brute force, the repetition-padding case set Jaccard cannot see,
  * and the in-plan candidate budget. */
class WeightedJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], k: Int): Map[(Long, Long), Double] = {
    def bag(t: String): Map[String, Long] = {
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (ws.length < k) Map.empty
      else ws.sliding(k).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (s, o) => s -> o.size.toLong }
    }
    val bags = docs.map { case (id, t) => id -> bag(t) }
    (for {
      (ia, ba) <- bags; (ib, bb) <- bags if ia < ib
      inter = (ba.keySet & bb.keySet).toSeq.map(s => math.min(ba(s), bb(s))).sum
      tot = ba.values.sum + bb.values.sum - inter
      if tot > 0
      j = java.math.BigDecimal.valueOf(inter.toDouble / tot.toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    } yield (ia, ib) -> j).toMap
  }

  private def run(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), Double] =
    Dedup.weightedJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("blocked == brute force on a mixed corpus") {
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      1L -> base,
      2L -> (base + " extra1 extra2"),              // near-dup of 1
      3L -> (base + " " + base),                    // 1 doubled
      4L -> (1 to 20).map(i => s"other$i").mkString(" "),
      5L -> ((1 to 10).map(i => s"tok$i").mkString(" ") + " " +
        (1 to 10).map(i => s"other$i").mkString(" ")))
    val expected = brute(docs, 3).filter(_._2 >= 0.3)
    assert(run(docs, 0.3) === expected)
    assert(expected.nonEmpty)
  }

  test("repetition padding: set Jaccard blind, weighted Jaccard sees it") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(1L -> base, 2L -> (base + " " + base + " " + base))
    // identical shingle TYPES modulo the two seam shingles -> set J ~ 1
    val setJ = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, threshold = 0.9)
      .collect()
    assert(setJ.length === 1, "set Jaccard must call these near-identical")
    // weighted: |A|=28, shared min mass 28, |B|=88 -> J_w = 28/88 ~ 0.318
    val got = run(docs, 0.1)
    assert(got.contains((1L, 2L)) && got((1L, 2L)) < 0.4,
      s"weighted Jaccard must collapse under padding, got $got")
  }

  test("candidate budget refuses loudly in-plan") {
    val same = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = (1L to 30L).map(i => i -> same)
    val e = intercept[Exception] {
      Dedup.weightedJaccardPairs(docs.toDF("doc_id", "text"), "doc_id",
        "text", k = 3, threshold = 0.8, maxCandidatePairs = 10L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxCandidatePairs"))
  }
}
