package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Trainer-facing loss masks ([[TextAnalysis.packedLossMasks]]): '0'
  * slots exactly cover corpus-duplicated span positions in the packed
  * layout, totals reconcile, and a document spanning a sequence
  * boundary splits its mask across both sequences. */
class LossMaskSpec extends SparkSpec {
  import spark.implicits._

  // one shard (ids all ≡ 0 mod 8), tokensPerSeq = 16 so doc 8 (id 8)
  // straddles a boundary. The 8-token boilerplate run appears in docs 0
  // and 8; all other tokens are globally unique.
  private val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
  private def uniq(d: Int, n: Int) = (1 to n).map(i => s"d${d}u$i").mkString(" ")
  private lazy val docsDf = Seq(
    (0L, s"$boiler ${uniq(0, 4)}"),   // 12 tokens: mask 0..7 masked
    (8L, s"${uniq(8, 6)} $boiler"),   // 14 tokens: last 8 masked
    (16L, uniq(16, 6))                // 6 tokens: clean
  ).toDF("doc_id", "text")

  private lazy val out = TextAnalysis.packedLossMasks(docsDf, "doc_id",
    "text", k = 8, minOccurrences = 2, tokensPerSeq = 16, nShards = 8)
    .orderBy("seq_id").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4)))

  test("masks cover exactly the duplicated spans, split at the boundary") {
    // packing (shard 0, by doc_id): doc0 tokens 0-11, doc8 12-25,
    // doc16 26-31 → seq0 = doc0(12) + doc8 first 4; seq1 = doc8 last 10
    // + doc16(6). doc8's boilerplate is its positions 6-13 → global
    // 18-25 → seq1 slots 2-9.
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((0L, 0L), (0L, 1L)))
    val (_, _, n0, m0, mask0) = out(0)
    val (_, _, n1, m1, mask1) = out(1)
    assert(n0 == 16 && n1 == 16)
    assert(mask0 == "0" * 8 + "1" * 8) // doc0's boilerplate + unique tail + doc8 head
    assert(mask1 == "11" + "0" * 8 + "1" * 6)
    assert(m0 == 8 && m1 == 8)
  }

  test("totals reconcile with the corpus") {
    assert(out.map(_._3).sum == 12 + 14 + 6)
    assert(out.map(_._4).sum == 16) // two 8-token spans
    assert(out.forall(t => t._5.length == t._3))
    assert(out.forall(t => t._5.count(_ == '0') == t._4))
  }

  test("a clean corpus is all-ones") {
    val clean = TextAnalysis.packedLossMasks(
      Seq((0L, uniq(1, 10)), (8L, uniq(2, 10))).toDF("doc_id", "text"),
      "doc_id", "text", k = 8, minOccurrences = 2, tokensPerSeq = 16,
      nShards = 8).collect()
    assert(clean.forall(r => !r.getString(4).contains('0')))
  }
}
