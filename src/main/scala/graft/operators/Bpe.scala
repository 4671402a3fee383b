package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BYTE-PAIR-ENCODING merge learning — the tokenizer-training step of an
  * LLM data pipeline, run where it belongs at scale: on the WORD
  * FREQUENCY TABLE (vocab-scale), not the corpus. The corpus is scanned
  * exactly once (word counts, map-side combined); every merge round then
  * aggregates the vocab only — at 100 TB the vocab is millions of rows
  * against trillions of corpus tokens, so rounds are metadata-cheap and
  * the expensive thing (the corpus scan) is amortized to one pass.
  *
  * Representation: each word's symbol sequence is a SENTINEL-DELIMITED
  * string — every symbol wrapped in the \u0001 sentinel (`␁c␁␁a␁␁t␁`) — so a merge is
  * a LITERAL string replace of `␁l␁␁r␁` with `␁lr␁`: the sentinels make
  * boundary-safe matching possible without lookbehind regex (RE2-safe →
  * the DuckDB oracle applies the identical replace), and Spark's
  * codegen'd `replace` applies merges left-to-right non-overlapping —
  * the classic BPE semantics. Pair counting is adjacent-position
  * extraction over the split symbol list, weighted by word count;
  * the winning pair per round (count desc, then lexicographic) is ONE
  * collected row (metadata-scale, justified — it parameterizes the next
  * round's replace expression). */
object Bpe {

  private val S = "\u0001"

  /** Learn `rounds` BPE merges from the corpus. Returns one row per
    * round: (round, left, right, pair_count) — the merge table a
    * tokenizer ships. */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "learnMerges: rounds must be >= 1")
    val spark = docs.sparkSession
    // ONE corpus pass: the word frequency table
    val vocab0 = docs.select(explode(TF.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("str",
        concat(lit(S), concat_ws(S + S, split(col("word"), "")), lit(S)))
    var vocab = vocab0.localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val syms = filter(split(col("str"), S), x => length(x) > 0)
      val pairs = vocab.select(col("cnt"),
        explode(zip_with(slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      val win = pairs.groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).cast("long").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect() // 1 row: the round's winning pair (metadata)
      if (win.isEmpty) {
        // vocabulary fully merged — no adjacent pairs left anywhere
        Blocks.release(vocab)
        import spark.implicits._
        return merges.result()
          .toDF("round", "left", "right", "pair_count").orderBy("round")
      }
      val l = win(0).getString(0); val r = win(0).getString(1); val c = win(0).getLong(2)
      merges += ((round, l, r, c))
      val next = vocab.withColumn("str",
        replace(col("str"),
          lit(S + l + S + S + r + S), lit(S + l + r + S)))
        .localCheckpoint(true)
      Blocks.release(vocab)
      vocab = next
    }
    Blocks.release(vocab)
    import spark.implicits._
    merges.result().toDF("round", "left", "right", "pair_count")
      .orderBy("round")
  }

  /** BPE ENCODE — the tokenizer-APPLY pass that turns a learned merge
    * table into per-document subword token counts. Applied where it is
    * cheap at scale: on the VOCABULARY (distinct words), never the token
    * stream — each distinct word is encoded once through the merge chain
    * and the result joins back to the per-(doc, word) count table, so the
    * replace chain runs O(vocab) times against O(corpus tokens) uses.
    *
    * The merge table is collected to the driver (metadata-scale by
    * construction — it IS the tokenizer artifact, `rounds` rows) and
    * compiled into a chain of codegen'd literal `replace`s in learned
    * order, the exact BPE apply semantics (left-to-right non-overlapping
    * per round, sentinel-delimited so matches are boundary-safe). For
    * tokenizer-sized tables (32k merges) the same fold would compile the
    * merge list into an array literal and apply it with one `aggregate`
    * HOF instead of nesting 32k expressions; at this gate's scale the
    * nested chain keeps everything in whole-stage codegen.
    *
    * Output: one row per document that has at least one token —
    * (id, n_words, n_bpe_tokens); integers end to end, oracle-exact. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("round").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    val tokens = docs.select(col(idCol), explode(TF.words(col(textCol))).as("word"))
    val perDocWord = tokens.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val vocab = perDocWord.select(col("word")).distinct()
    val encoded = ms.foldLeft(
      concat(lit(S), concat_ws(S + S, split(col("word"), "")), lit(S))) {
      case (acc, (l, r)) =>
        replace(acc, lit(S + l + S + S + r + S), lit(S + l + r + S))
    }
    val wordSyms = vocab.withColumn("n_syms",
      size(filter(split(encoded, S), x => length(x) > 0)).cast("long"))
    perDocWord.join(wordSyms, "word")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("cnt") * col("n_syms")).cast("long").as("n_bpe_tokens"))
  }
}
