package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Splits are keyed on a CONTENT hash, not a random number: the same
  * document always lands in the same split (reproducible across runs,
  * engines, and re-shards), and byte-identical duplicates can never
  * straddle train/test (the classic leakage bug that random splits
  * invite). Per-row expression — scan-speed at any scale, no RNG state.
  */
object Sampling {

  /** Bucket in [0, buckets) from the modular rolling content hash. */
  def contentBucket(textCol: Column, buckets: Int = 100): Column =
    pmod(TF.rollingFingerprint(textCol), lit(buckets.toLong))

  /** train/val/test label from content-hash buckets; `trainPct`+`valPct`
    * out of 100, remainder = test. */
  def contentSplit(textCol: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = contentBucket(textCol, 100)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic per-stratum sample: keep ~pct% of each stratum by
    * content bucket — proportions hold within every stratum without a
    * shuffle or a sort (stratified sampling as a filter). */
  def stratifiedSample(df: DataFrame, textCol: String, pct: Int): DataFrame =
    df.filter(contentBucket(col(textCol), 100) < pct)
}
