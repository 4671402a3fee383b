package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** [[TextAnalysis.perplexityFilter]] — the reference-LM quality gate:
  * hand-replayed interpolated absolute-discount probabilities, unigram
  * backoff for unseen prefixes, smoothing (P > 0 everywhere), the
  * short-doc pin, and reference-unlike docs scoring worse. */
class PerplexityFilterSpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  // reference corpus: "a b a c" — bigram counts a b:1, b a:1, a c:1;
  // prefix a: c1=2 k1=2, b: c1=1 k1=1; unigrams a:2 b:1 c:1; N=4 V=3
  private val ref = Seq((100L, "a b a c")).toDF("doc_id", "text")

  private def pu(cu: Long, n: Long, v: Long): Double =
    (cu.toDouble + 1.0) / (n + v).toDouble
  private def pSeen(c12: Long, c1: Long, k1: Long, puW2: Double): Double =
    math.max(c12.toDouble - D, 0.0) / c1.toDouble +
      D * k1.toDouble / c1.toDouble * puW2
  private def nlp6(p: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(-math.log(p))
      .setScale(6, java.math.RoundingMode.HALF_UP)
  private def mean6(nlps: Seq[java.math.BigDecimal]): Double = {
    val s = nlps.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    java.math.BigDecimal.valueOf(s.doubleValue / nlps.size)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  }

  private def run(docs: Seq[(Long, String)],
                  threshold: Double = 8.0): Map[Long, (Long, Double, Boolean)] =
    TextAnalysis.perplexityFilter(docs.toDF("doc_id", "text"), ref,
        "doc_id", "text", threshold = threshold)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))).toMap

  test("hand-replayed probabilities: seen, smoothed-unseen, and backoff") {
    val got = run(Seq(
      (1L, "a b"),   // seen bigram
      (2L, "a a"),   // seen prefix, unseen continuation (smoothed)
      (3L, "z b"),   // unseen prefix -> unigram backoff
      (4L, "z q")))  // everything unseen -> OOV unigram
    val (n, v) = (4L, 3L)
    assert(got(1L) === ((1L,
      mean6(Seq(nlp6(pSeen(1, 2, 2, pu(1, n, v))))), true)))
    assert(got(2L) === ((1L,
      mean6(Seq(nlp6(pSeen(0, 2, 2, pu(2, n, v))))), true)))
    assert(got(3L) === ((1L, mean6(Seq(nlp6(pu(1, n, v)))), true)))
    assert(got(4L) === ((1L, mean6(Seq(nlp6(pu(0, n, v)))), true)))
    // smoothing really is positive mass: no NaN/Inf ever reached a score
    got.values.foreach { case (_, m, _) => assert(!m.isNaN && !m.isInfinite) }
  }

  test("maintained LM == one-shot through replay and fold") {
    val root = tmpDir("lm_")
    val refDocs = Seq((100L, "a b a c"), (101L, "b a c a"), (102L, "c a b"))
    val refDf = refDocs.toDF("doc_id", "text")
    val score = Seq((1L, "a b a"), (2L, "z b c"), (3L, "q"))
    (0 until 3).foreach(i => TextAnalysis.commitLmBatch(
      refDf.filter(col("doc_id") % 3 === i), "text", root, i.toLong))
    // replayed epoch must not double-count
    TextAnalysis.commitLmBatch(refDf.filter(col("doc_id") % 3 === 1),
      "text", root, 1L)
    assert(TextAnalysis.foldLm(spark, root, upTo = 1L) === ((2, 2)))
    val inc = TextAnalysis.perplexityFilterFromLm(score.toDF("doc_id", "text"),
        "doc_id", "text", root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val one = TextAnalysis.perplexityFilter(score.toDF("doc_id", "text"),
        refDf, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(inc === one)
  }

  test("short docs pin to (0, 0.0, keep=false); gate splits by likeness") {
    val got = run(Seq(
      (1L, "a"),                       // no bigram
      (2L, "a b a c a b a c"),         // reference-like
      (3L, "z q z q z q z q")),        // reference-unlike
      threshold = 1.5)
    assert(got(1L) === ((0L, 0.0, false)))
    assert(got(2L)._2 < got(3L)._2,
      s"reference-like ${got(2L)._2} should outscore unlike ${got(3L)._2}")
    assert(got(2L)._3 && !got(3L)._3)
  }
}
