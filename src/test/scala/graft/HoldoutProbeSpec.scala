package graft

import graft.operators.QualityProbe
import org.apache.spark.sql.functions._

/** The HELD-OUT-LABEL probe ([[QualityProbe.trainAndScoreHoldout]]):
  * labels come from an external signal, training sees only the train
  * split, and the learned scorer must TRANSFER — rank held-out docs
  * better than the rule gate can. The driver corpus is feature-blind
  * w.r.t. external labels (uniform word salad), so the transfer claim
  * is pinned HERE on a planted-signal fixture: the "expensive
  * analyzer" label flags repetition at a threshold (0.12) STRICTER
  * than the rule gate's (0.2), so mild repeaters pass the rule but
  * carry bad labels — only a probe that learned the label's continuous
  * repetition gradient ranks them below clean docs. */
class HoldoutProbeSpec extends SparkSpec {
  import spark.implicits._

  /** ~frac of the doc is one repeated word; the rest distinct medium
    * words plus a stopword marker, so every doc passes the rule gate's
    * length/stopword/word-len thresholds and only the repetition
    * fractions vary. */
  private def doc(i: Int, repFrac: Double): String = {
    val n = 40
    val r = math.max(1, math.round(repFrac * n).toInt)
    val rep = Seq.fill(r)(s"dup$i")
    val rest = (1 to (n - r)).map(k => s"w${i}k$k")
    ("the" +: (rep ++ rest)).mkString(" ")
  }

  // repetition fractions span the rule gate's blind window: the
  // analyzer (label) flags > 0.12; the rule gate only flags > 0.2.
  // ids interleave so the %5 holdout sees every band.
  private val fracs: Seq[Double] =
    (0 until 40).map(i => (i % 8) * 0.04) // 0, .04, .08, .12, .16, .20, .24, .28
  private lazy val corpus =
    fracs.zipWithIndex.map { case (f, i) => (i.toLong, doc(i, f), f) }
  private lazy val docsDf = corpus.map(t => (t._1, t._2)).toDF("doc_id", "text")
  // the external "expensive analyzer": label from the PLANTED fraction,
  // not from any probe feature pipeline
  private lazy val labelsDf = corpus
    .map(t => (t._1, if (t._3 <= 0.12) 1.0 else 0.0)).toDF("doc_id", "y")

  private def auc(scored: Seq[(Double, Boolean)]): Double = {
    val pos = scored.collect { case (s, true) => s }
    val neg = scored.collect { case (s, false) => s }
    assert(pos.nonEmpty && neg.nonEmpty, "degenerate AUC fixture")
    pos.flatMap(p => neg.map(q =>
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0)).sum / (pos.size * neg.size)
  }

  test("probe trained on held-out labels out-ranks the rule gate") {
    val out = QualityProbe.trainAndScoreHoldout(docsDf, "doc_id", "text",
      labelsDf, holdout = col("doc_id") % 5 === 0, iterations = 25)
      .orderBy("doc_id").collect()
    assert(out.length == 8) // exactly the held-out 20%
    val rows = out.map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
      r.getDouble(3)))
    val probeAuc = auc(rows.map(t => (t._4, t._2)).toSeq)
    val ruleAuc = auc(rows.map(t => (if (t._3) 1.0 else 0.0, t._2)).toSeq)
    // the rule gate cannot see the 0.12-0.20 band (its threshold is
    // 0.2): its AUC is capped below the label-trained probe's
    // (measured: probe 1.0, rule 0.875 on this fixture)
    assert(probeAuc > ruleAuc,
      s"no transfer: probe AUC $probeAuc vs rule AUC $ruleAuc")
    assert(probeAuc >= 0.95, s"weak transfer: probe AUC $probeAuc")
  }

  test("holdout rows never leak into training") {
    // corrupting every held-out label must leave the learned scorer
    // bit-identical — training reads only the train split
    val flipped = labelsDf.withColumn("y",
      when(col("doc_id") % 5 === 0, lit(1.0) - col("y")).otherwise(col("y")))
    val a = QualityProbe.trainAndScoreHoldout(docsDf, "doc_id", "text",
      labelsDf, holdout = col("doc_id") % 5 === 0)
      .select("doc_id", "probe_score").orderBy("doc_id").collect()
    val b = QualityProbe.trainAndScoreHoldout(docsDf, "doc_id", "text",
      flipped, holdout = col("doc_id") % 5 === 0)
      .select("doc_id", "probe_score").orderBy("doc_id").collect()
    assert(a.map(_.getDouble(1)).toSeq == b.map(_.getDouble(1)).toSeq)
  }

  test("output contract: holdout only, labels carried, keep = score >= 0.5") {
    val out = QualityProbe.trainAndScoreHoldout(docsDf, "doc_id", "text",
      labelsDf, holdout = col("doc_id") % 5 === 0).collect()
    assert(out.forall(_.getLong(0) % 5 == 0))
    assert(out.forall(r => r.getBoolean(4) == (r.getDouble(3) >= 0.5)))
    val lbl = corpus.map(t => t._1 -> (t._3 <= 0.12)).toMap
    assert(out.forall(r => r.getBoolean(1) == lbl(r.getLong(0))))
  }
}
