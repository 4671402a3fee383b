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

  /** Rolling-hash document fingerprint (64-bit). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      TF.rollingFingerprint(col(textCol)).as("fingerprint"))
}
