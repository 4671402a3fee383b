package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning: hand-checked merges on the classic toy corpus,
  * non-overlapping left-to-right merge semantics, boundary safety of the
  * sentinel representation, and the fully-merged early exit. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: String*) =
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  private def merges(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    Bpe.learnMerges(df, "text", rounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("classic toy corpus: merges follow weighted pair frequency") {
    // 3×low, 1×lower, 1×lowest: 'l o' and 'o w' both appear 5 times ->
    // lexicographic tie-break picks (l, o); then ('lo', 'w') at 5
    val m = merges(corpus("low low low lower lowest"), 2)
    assert(m(0) == ((1, "l", "o", 5L)))
    assert(m(1) == ((2, "lo", "w", 5L)))
  }

  test("merges are non-overlapping left-to-right") {
    // 'aaaa': round-1 pair (a,a) counts 3 (adjacent positions), but the
    // merge rewrites to [aa][aa] — round 2 sees ONE (aa,aa) pair
    val m = merges(corpus("aaaa"), 2)
    assert(m(0) == ((1, "a", "a", 3L)))
    assert(m(1) == ((2, "aa", "aa", 1L)))
  }

  test("sentinel boundaries: a merged symbol never matches inside another") {
    // after (a,b)->ab, the word 'cab' contains the char sequence 'ab'
    // but as symbols [c][a][b] -> merges to [c][ab]; 'xab' likewise.
    // A merge of (c, ab) must then count both words, not some substring
    val m = merges(corpus("ab ab ab cab cab xab"), 2)
    assert(m(0) == ((1, "a", "b", 6L)))
    assert(m(1) == ((2, "c", "ab", 2L)))
  }

  test("fully merged vocabulary exits early with the merges learned so far") {
    val m = merges(corpus("ab ab"), 10) // round 1 merges (a,b); nothing left
    assert(m.length == 1 && m(0) == ((1, "a", "b", 2L)))
    // zero residual blocks after the early exit too
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("encode applies learned merges in order and re-counts per doc") {
    // corpus: low×3 lower lowest — merges: (l,o), (lo,w) -> symbol 'low'
    val df = corpus("low low low", "lower lowest")
    val enc = Bpe.encode(df, "id", "text", Bpe.learnMerges(df, "text", 2))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 0: 'low'×3 -> 1 symbol each = 3 bpe tokens from 3 words
    // doc 1: lower = [low][e][r] (3), lowest = [low][e][s][t] (4)
    assert(enc(0) == ((0L, 3L, 3L)))
    assert(enc(1) == ((1L, 2L, 7L)))
  }

  test("encode with an empty merge table degrades to character counts") {
    val df = corpus("ab cde")
    val empty = Bpe.learnMerges(df.filter(lit(false)), "text", 1)
    val enc = Bpe.encode(df, "id", "text", empty).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc(0) == ((0L, 2L, 5L))) // 2 words, 2+3 single-char symbols
  }
}
