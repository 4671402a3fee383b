package graft

import graft.operators.{TextAnalysis, TextIndex}
import org.apache.spark.sql.functions._

/** Inverted-index lifecycle: index-served BM25 ≡ corpus-scan BM25,
  * driver-side bucket routing ≡ the engine's pmod(xxhash64) partition
  * values, replay idempotence, and text-never-read at query time. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    1L -> "cat cat dog bird", 2L -> "cat dog bird fish",
    3L -> "dog bird fish worm", 4L -> "worm worm cat moth",
    5L -> "moth fish cat dog", 6L -> "bird bird bird cat")
    .toDF("doc_id", "text")

  test("index-served BM25 equals the corpus-scan operator exactly") {
    val root = tmpDir("tidx_eq")
    (0 until 3).foreach(i => TextIndex.commitPostings(
      corpus.filter(col("doc_id") % 3 === i), "doc_id", "text", root, i.toLong))
    val fromIndex = TextIndex.bm25FromIndex(spark, root,
      Seq("cat", "worm"), topK = 10)
    val fromScan = TextAnalysis.bm25(corpus, "doc_id", "text",
      Seq("cat", "worm"), topK = 10)
    assert(fromIndex.exceptAll(fromScan).isEmpty &&
      fromScan.exceptAll(fromIndex).isEmpty)
    // fold retention must not change the answer
    assert(TextIndex.foldIndex(spark, root, upTo = 1L) == ((2, 2)))
    val afterFold = TextIndex.bm25FromIndex(spark, root,
      Seq("cat", "worm"), topK = 10)
    assert(afterFold.exceptAll(fromScan).isEmpty &&
      fromScan.exceptAll(afterFold).isEmpty)
  }

  test("driver-side bucket routing matches the engine's partition values") {
    val root = tmpDir("tidx_bkt")
    TextIndex.commitPostings(corpus, "doc_id", "text", root, 0L)
    // the engine's bucket for each term, read back from the index
    val engine = graft.sources.TransactionalLake
      .readCommitted(spark, s"$root/postings")
      .select(col("term"), col("tbucket").cast("long")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, b) <- engine) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType, 42L)
      val n = TextIndex.DefaultBuckets
      assert(((h % n) + n) % n == b, s"bucket mismatch for '$t'")
    }
    // a pruned query never misses: every posting for the query terms
    // survives the bucket filter (equality already proven above; this
    // pins the routing itself for a term in every bucket position)
    assert(engine.keySet == Set("cat", "dog", "bird", "fish", "worm", "moth"))
  }

  test("phrase search: positional intersection matches a token scan") {
    val root = tmpDir("tidx_phrase")
    val c = Seq(
      1L -> "big cat sat big cat sat",   // "big cat" twice
      2L -> "cat big cat nap",           // once
      3L -> "big dog big dog",           // never
      4L -> "a a a a")                   // overlap probe
      .toDF("doc_id", "text")
    TextIndex.commitPostings(c, "doc_id", "text", root, 0L)
    val out = TextIndex.phraseSearch(spark, root, Seq("big", "cat"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
    // overlapping occurrences all count ("a a a a" has three "a a")
    val ov = TextIndex.phraseSearch(spark, root, Seq("a", "a"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov == Map(4L -> 3L))
    // 3-term phrase chains the intersection
    val three = TextIndex.phraseSearch(spark, root,
      Seq("big", "cat", "sat"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three == Map(1L -> 2L))
  }

  test("CMS index: batch-committed sketch equals the one-shot sketch cell-for-cell") {
    import graft.operators.CmsIndex
    val inc = tmpDir("cms_inc"); val one = tmpDir("cms_one")
    (0 until 3).foreach(i => CmsIndex.commitBatch(
      corpus.filter(col("doc_id") % 3 === i), "text", inc, i.toLong))
    CmsIndex.commitBatch(corpus, "text", one, 0L)
    val a = CmsIndex.sketch(spark, inc).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = CmsIndex.sketch(spark, one).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b && a.nonEmpty)
    // estimates are never under the true counts (structural guarantee)
    val exact = corpus.select(explode(
        graft.functions.TextFunctions.words(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val est = CmsIndex.estimate(spark, inc, exact.select("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- exact.collect())
      assert(est(r.getString(0)) >= r.getLong(1), s"under-count: ${r.getString(0)}")
    // total stream length is exact (a full sketch row sums every token)
    assert(CmsIndex.totalCount(spark, inc) ==
      corpus.select(explode(graft.functions.TextFunctions.words(col("text"))))
        .count())
  }

  test("replayed index epoch is a no-op (disjoint-batch additivity safe)") {
    val root = tmpDir("tidx_replay")
    TextIndex.commitPostings(corpus.filter(col("doc_id") <= 3), "doc_id",
      "text", root, 0L)
    val before = TextIndex.bm25FromIndex(spark, root, Seq("cat"), topK = 10)
      .collect().toSeq
    // crash replay with different (stale) content: committed epoch wins
    TextIndex.commitPostings(corpus, "doc_id", "text", root, 0L)
    val after = TextIndex.bm25FromIndex(spark, root, Seq("cat"), topK = 10)
      .collect().toSeq
    assert(after == before)
  }
}
