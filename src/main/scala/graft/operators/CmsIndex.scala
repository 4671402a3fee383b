package graft.operators

import graft.functions.{TextFunctions => TF}
import graft.sources.TransactionalLake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL COUNT-MIN SKETCH index — the frequency summary a corpus
  * pipeline maintains continuously: each document batch commits its
  * d×w counter-cell DELTAS as a transactional epoch (cells are the
  * mergeable representation of a CMS — merging sketches IS adding
  * cells, so the committed history is a sketch of the whole corpus and
  * retention folds bin-pack it without changing a single estimate).
  * Per batch the cost is one map-side-combined aggregate to at most
  * d×w rows (constant!); a frequency query touches d cells per term
  * and NEVER the corpus. The exact aggregate exists only in the gate,
  * where it doubles as the oracle for the sketch's two structural
  * guarantees (never-under; over by ≤ ε·N with the fixed hash family).
  * Hash family: `xxhash64(rowIndex, term) mod w` — d independent-ish
  * rows from one seeded hash, reproducible everywhere. */
object CmsIndex {

  val Depth = 4
  val Width = 1024

  private def cellOf(r: org.apache.spark.sql.Column,
                     term: org.apache.spark.sql.Column) =
    pmod(xxhash64(r, term), lit(Width.toLong))

  /** Commit one document batch's counter-cell deltas as epoch
    * `epochId`. Batches must be disjoint in documents (additivity —
    * the same contract as every incremental index here). */
  def commitBatch(docs: DataFrame, textCol: String, root: String,
                  epochId: Long): Unit = {
    val cells = docs.select(explode(TF.words(col(textCol))).as("term"))
      .select(col("term"),
        explode(sequence(lit(0), lit(Depth - 1))).as("r"))
      .groupBy(col("r"), cellOf(col("r"), col("term")).as("c"))
      .agg(count(lit(1)).cast("long").as("n"))
    TransactionalLake.commitEpoch(cells, root, epochId,
      partitionCols = Nil)
  }

  /** The folded sketch: per-cell totals across every committed epoch
    * (O(d·w) rows regardless of corpus size). */
  def sketch(spark: SparkSession, root: String): DataFrame =
    TransactionalLake.readCommitted(spark, root)
      .groupBy("r", "c").agg(sum(col("n")).cast("long").as("n"))

  /** Point-frequency estimates for `terms` (a 1-column `term` frame):
    * min over the d rows' cells — never under the true count. */
  def estimate(spark: SparkSession, root: String,
               terms: DataFrame): DataFrame = {
    val sk = sketch(spark, root)
    terms.select(col("term"),
      explode(sequence(lit(0), lit(Depth - 1))).as("r"))
      .withColumn("c", cellOf(col("r"), col("term")))
      .join(sk, Seq("r", "c"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("n"), lit(0L))).cast("long").as("est"))
  }

  /** Total stream length N (the sum of any one sketch row). */
  def totalCount(spark: SparkSession, root: String): Long =
    sketch(spark, root).filter(col("r") === 0)
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
}
