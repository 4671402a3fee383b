package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Blocked ≡ brute-force for [[Dedup.longestDupSubstrings]]: the anchored
  * L-gram run-merge must reproduce, doc for doc, the longest cross-doc
  * common word-substring (≥ L) a quadratic scan finds — on a synthetic
  * corpus with planted repeats AND on the sf0.001 documents table. Plus
  * the in-plan anchor budget's fail-loud contract. */
class LongestDupSubstringSpec extends SparkSpec {
  import spark.implicits._

  /** Quadratic ground truth: per doc, (maxLen, smallest start) of the
    * longest word-substring of length ≥ l shared verbatim with another
    * doc — classic O(n·m) common-substring DP per pair. */
  private def brute(docs: Seq[(Long, String)], l: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    }
    val best = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    for ((ia, wa) <- toks; (ib, wb) <- toks if ia != ib) {
      // dp(j) = length of common suffix of wa[..i] and wb[..j]
      var prev = new Array[Int](wb.length + 1)
      var cur = new Array[Int](wb.length + 1)
      for (i <- 1 to wa.length) {
        java.util.Arrays.fill(cur, 0)
        for (j <- 1 to wb.length) {
          if (wa(i - 1) == wb(j - 1)) {
            cur(j) = prev(j - 1) + 1
            val len = cur(j)
            if (len >= l) {
              val start = (i - len).toLong
              val cand = (len.toLong, start)
              val old = best.get(ia)
              // longest wins; ties -> smallest start
              if (old.forall(o => cand._1 > o._1 ||
                  (cand._1 == o._1 && cand._2 < o._2)))
                best(ia) = cand
            }
          }
        }
        val t = prev; prev = cur; cur = t
      }
    }
    best.toMap
  }

  private def run(docs: Seq[(Long, String)], l: Int): Map[Long, (Long, Long)] =
    Dedup.longestDupSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text",
        minWords = l)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("anchored run-merge == quadratic brute force on planted repeats") {
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      1L -> s"alpha beta $boiler gamma delta",
      2L -> s"$boiler epsilon zeta eta theta iota kappa",
      // doc 3 repeats only a 7-word piece of the boilerplate (below L=8)
      3L -> "quick brown fox jumps over the lazy cat instead here",
      // docs 4/5 share a DIFFERENT long span, longer than the boilerplate
      4L -> "one two three four five six seven eight nine ten eleven twelve sentinel",
      5L -> "prefix one two three four five six seven eight nine ten eleven twelve",
      // unrelated doc: no output row expected
      6L -> "completely unrelated words with no overlap whatsoever at all",
      // short doc (< L words): never anchors
      7L -> "tiny doc here")
    val l = 8
    assert(run(docs, l) === brute(docs, l))
  }

  test("anchored run-merge == brute force on sf0.001 documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run(docs, 8) === brute(docs, 8))
  }

  test("ties on length resolve to the smallest start") {
    // two 8-word spans duplicated from doc 10, at starts 0 and 9 of doc
    // 10; both maximal with len 8 -> report start 0
    val s1 = "a b c d e f g h"
    val s2 = "p q r s t u v w"
    val docs = Seq(
      10L -> s"$s1 x $s2",
      11L -> s"$s1 y zz",
      12L -> s"ww $s2")
    val got = run(docs, 8)
    assert(got(10L) === (8L, 0L))
    assert(got(11L) === (8L, 0L))
    assert(got(12L) === (8L, 1L))
  }

  test("anchor budget refuses loudly in-plan (message-keyed, at the eager " +
      "anchor materialization)") {
    val same = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = (1L to 30L).map(i => i -> same)
    // the operator is EAGER (anchors are copied out at call time), so
    // the in-plan refusal surfaces from the call itself
    val e = intercept[Exception] {
      Dedup.longestDupSubstrings(docs.toDF("doc_id", "text"),
        "doc_id", "text", minWords = 8, maxAnchorPairs = 10L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxAnchorPairs"),
      s"expected the budget message, got: ${e.getMessage}")
  }
}
