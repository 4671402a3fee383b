package graft

import graft.operators.QualityProbe
import org.apache.spark.sql.functions._

/** The trained quality probe ([[QualityProbe]]): the engine's exact-
  * decimal GD must match a driver-side hand replay bit for bit, be
  * invariant to partitioning, and actually LEARN (separate quality
  * docs from garbage with the rule gate as the teacher). */
class QualityProbeSpec extends SparkSpec {
  import spark.implicits._

  // a clearly separable corpus: quality docs pass every rule (one
  // stopword marker, otherwise all-distinct medium-length words, so
  // top-word and dup-bigram fractions stay tiny); garbage docs are
  // single-token repetitions (top_word_frac = 1, no stopword)
  private def goodDoc(i: Int) =
    ("the" +: (1 to 30).map(k => s"word$i" + "x" * (k % 3) + k)).mkString(" ")
  private lazy val corpus =
    ((1L to 12L).map(i => (i, goodDoc(i.toInt))) ++
      (13L to 24L).map(i => (i, Seq.fill(30)(s"spam$i").mkString(" "))))
      .toDF("doc_id", "text")

  private def round9(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  test("engine GD == driver-side hand replay, and partition-invariant") {
    val scored = QualityProbe.trainAndScore(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    // hand replay from the same feature rows
    val m = graft.operators.TextAnalysis
      .qualityFilter(corpus, "doc_id", "text")
      .select(col("doc_id"),
        (round(log(lit(1.0) + col("n_words").cast("double")), 6) / lit(10.0))
          .as("x1"),
        round(col("top_word_frac"), 6).as("x2"),
        round(col("dup_bigram_frac"), 6).as("x3"),
        (round(abs(col("mean_word_len") - lit(5.0)), 6) / lit(10.0)).as("x4"),
        col("has_stopword").cast("double").as("x5"),
        col("keep").cast("double").as("y"))
      .collect()
      .map(r => (r.getLong(0), Array(1.0, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)), r.getDouble(6)))
      .sortBy(_._1)
    val n = m.length
    var w = Array.fill(6)(0.0)
    for (_ <- 1 to QualityProbe.DefaultIterations) {
      // identical arithmetic: 9-dp pred, 9-dp terms, exact decimal sum
      val sums = Array.fill(6)(java.math.BigDecimal.ZERO)
      m.foreach { case (_, x, y) =>
        val pred = round9(w(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3) +
          w(4) * x(4) + w(5) * x(5))
        val r = y - pred
        for (j <- 0 until 6)
          sums(j) = sums(j).add(java.math.BigDecimal.valueOf(round9(x(j) * r)))
      }
      w = Array.tabulate(6)(j =>
        round9(w(j) + (QualityProbe.DefaultLr * 2.0) *
          sums(j).doubleValue / n))
    }
    def score6(x: Array[Double]): Double =
      java.math.BigDecimal.valueOf(w(0) + w(1) * x(1) + w(2) * x(2) +
          w(3) * x(3) + w(4) * x(4) + w(5) * x(5))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(scored.length === n)
    scored.zip(m).foreach { case (row, (id, x, y)) =>
      assert(row.getLong(0) === id)
      assert(row.getBoolean(1) === (y == 1.0))
      assert(row.getDouble(2) === score6(x),
        s"doc $id: engine ${row.getDouble(2)} vs replay ${score6(x)}")
    }
    // partition invariance: 7-way repartition trains identical weights
    val reScored = QualityProbe
      .trainAndScore(corpus.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    scored.zip(reScored).foreach { case (a, b) =>
      assert(a.getDouble(2) === b.getDouble(2))
    }
  }

  test("the probe learns the gate: quality docs outscore garbage") {
    val scored = QualityProbe.trainAndScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val good = (1L to 12L).map(scored)
    val bad = (13L to 24L).map(scored)
    assert(good.min > bad.max,
      s"probe failed to separate: good min ${good.min} <= bad max ${bad.max}")
  }

  test("probeBudgetSample spends each stratum's budget best-first") {
    // one budgeted stratum holding good and garbage docs, one budgeted
    // stratum fully covered, one unbudgeted stratum (must vanish)
    val rows = corpus.collect().map { r =>
      val id = r.getLong(0)
      val stratum = if (id <= 20) "A" else if (id <= 22) "B" else "C"
      (id, stratum, r.getString(1))
    }.toSeq
    val df = rows.toDF("doc_id", "source", "text")
    val kept = graft.operators.Sampling.probeBudgetSample(
        df, "doc_id", "source", "text", Map("A" -> 120L, "B" -> 100000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    assert(kept.forall(_._2 != "C"), "unbudgeted stratum must be dropped")
    assert(kept.count(_._2 == "B") === rows.count(_._2 == "B"),
      "an ample budget keeps the whole stratum")
    val keptA = kept.filter(_._2 == "A")
    assert(keptA.nonEmpty && keptA.length < rows.count(_._2 == "A"),
      "the tight budget must bind")
    // best-first: every kept A doc outscores (or ties at lower id) every
    // dropped A doc — with the good/garbage corpus, kept are good docs
    val scoresA = graft.operators.QualityProbe
      .trainAndScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val keptIds = keptA.map(_._1).toSet
    val droppedA = rows.filter(_._2 == "A").map(_._1).filterNot(keptIds)
    assert(keptA.map(x => scoresA(x._1)).min >=
      droppedA.map(scoresA).max,
      "budget must be spent on the highest-scoring docs first")
    // cum-before rule: the kept prefix (score desc, id) stays under 120
    val prefix = keptA.sortBy(x => (-x._3, x._1))
    val cumBefore = prefix.scanLeft(0L)(_ + _._4).init
    assert(cumBefore.forall(_ < 120L))
  }

  test("lr outside the stability bound is refused") {
    intercept[IllegalArgumentException] {
      QualityProbe.trainAndScore(corpus, "doc_id", "text", lr = 0.5)
    }
  }
}
