package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document table: language-ID, quality
  * scoring, token counting, fingerprinting. All per-row column
  * expressions — embarrassingly parallel, no shuffle, whole-stage
  * codegen'd end to end. At 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Quality/statistics profile per document. Ratios are deterministic
    * double arithmetic on exact integer counts (oracle-replicable). */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TF.words(col(textCol))
    val nTokens = size(toks)
    val nChars = length(col(textCol))
    val stopwords = TF.markerCount(toks, TF.langMarkers.flatMap(_._2))
    docs.select(
      col(idCol),
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      // mean token length over the whitespace tokens
      (aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        nTokens.cast("double")).as("mean_token_len"),
      (stopwords.cast("double") / nTokens.cast("double")).as("stopword_ratio"),
      (size(array_distinct(toks)).cast("double") / nTokens.cast("double"))
        .as("type_token_ratio"))
  }

  /** Language-ID via stopword-marker counts (TF.langId). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TF.langId(col(textCol)).as("detected_lang"))

  /** Token counts: whitespace tokens + BPE-ish pre-tokenizer count. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(TF.words(col(textCol))).cast("long").as("ws_tokens"),
      TF.bpeishTokenCount(col(textCol)).cast("long").as("bpeish_tokens"))

  /** Per-document top-k term profile with corpus document frequency —
    * the building block of TF-IDF feature pipelines. Shuffles once on
    * (doc, term) and once on term; integer counts only (deterministic). */
  def termFrequency(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), explode(TF.words(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tf").desc, col("term"))
    tf.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .join(dfreq, "term")
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rank"))
  }

  /** Gopher/RefinedWeb-style repetition quality signal: the duplicate
    * {2,3}-gram fraction per document (1 - distinct/total). Highly
    * repetitive documents (boilerplate, generated spam, scraped
    * navigation) score high and get filtered before training. Pure
    * per-row column arithmetic — no shuffle, no join; integer counts and
    * ONE double division keep it bit-exact against the oracle. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def frac(d: org.apache.spark.sql.Column,
             n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(n > 0, lit(1.0) - d.cast("double") / n.cast("double")).otherwise(lit(0.0))
    docs.select(col(idCol), TF.words(col(textCol)).as("toks"))
      .withColumn("sh2", TF.shingles(col("toks"), 2))
      .withColumn("sh3", TF.shingles(col("toks"), 3))
      .select(col(idCol),
        size(col("sh2")).cast("long").as("n2"),
        size(array_distinct(col("sh2"))).cast("long").as("d2"),
        size(col("sh3")).cast("long").as("n3"),
        size(array_distinct(col("sh3"))).cast("long").as("d3"))
      .withColumn("dup2_frac", frac(col("d2"), col("n2")))
      .withColumn("dup3_frac", frac(col("d3"), col("n3")))
  }

  /** Corpus-level heavy hitters: exact top-k terms by count,
    * cross-checked against a COUNT-MIN SKETCH built over the same token
    * stream. The sketch is the 100 TB half of the operator: a fixed-size
    * (w×d counters) MERGEABLE summary built in one pass with map-side
    * combines — at corpus scale you keep only the sketch plus a candidate
    * heap and skip the exact aggregate entirely; here the exact aggregate
    * doubles as the oracle and the sketch's guarantees become testable
    * output columns:
    *  - `cms_never_under`: estimate >= true count (structural CMS
    *    guarantee — must ALWAYS hold);
    *  - `cms_within_envelope`: estimate <= true + eps·N (holds with
    *    probability 1-δ; deterministic for the fixed seed).
    * The driver touches exactly k result terms and one constant-size
    * sketch — never the token stream. */
  def heavyHitters(docs: DataFrame, textCol: String,
                   topK: Int = 20, eps: Double = 0.001,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(explode(TF.words(col(textCol))).as("term"))
    val top = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(topK) // TakeOrdered, no full sort
    val cms = toks.stat.countMinSketch("term", eps, confidence, seed)
    val bound = (eps * cms.totalCount()).toLong
    val rows = top.collect().toSeq.map { r =>
      val term = r.getString(0)
      val n = r.getLong(1)
      val est = cms.estimateCount(term)
      (term, n, est >= n, est <= n + bound)
    }
    import spark.implicits._
    rows.toDF("term", "n", "cms_never_under", "cms_within_envelope")
      .orderBy(col("n").desc, col("term"))
  }

  /** Rolling-hash document fingerprint (64-bit). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      TF.rollingFingerprint(col(textCol)).as("fingerprint"))
}
