package graft.sources

import graft.model.Schemas
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Transactional (manifest-committed) lake sink: EXACTLY-ONCE streaming
  * delivery without read-side dedup — the architectural upgrade over the
  * at-least-once `foreachBatch` append path (`StreamingIngest.start`,
  * whose read-side recipe is gated by `pipe_streaming_exactly_once`).
  *
  * Layout:
  * {{{
  *   root/data/epoch=<id>/tenant=<t>/year=.../part-*.parquet
  *   root/_manifest/<id>                (committed-epoch marker)
  * }}}
  *
  * Protocol per epoch (the classic idempotent-epoch commit):
  *  1. Manifest entry already present → the epoch COMMITTED before a
  *     crash → skip entirely (replay after a post-commit failure is a
  *     no-op).
  *  2. Write the epoch's rows OVERWRITING the epoch's own directory —
  *     the target is a deterministic function of the epoch id, so a
  *     replay after a mid-write crash rewrites the same files instead of
  *     appending duplicates.
  *  3. Publish `_manifest/<id>` atomically (temp file + rename).
  * Readers list the manifest and read ONLY committed epoch directories:
  * however far an uncommitted write got, it is invisible. Epoch commit
  * is therefore atomic from any reader's point of view.
  *
  * Scale notes: the manifest is one tiny file per epoch (one rename per
  * trigger, no data-scale work); the epoch directory keeps the normal
  * Hive partition layout UNDER it, so tenant/time pruning still reaches
  * the file listing (`epoch` is just an extra leading partition column),
  * and `Lake.compact`-style bin-packing can fold old epochs together
  * once they age out of the replay window. On object stores, rename is
  * copy+delete but still single-object — the marker either exists or
  * does not; there is no partial-commit state.
  */
object TransactionalLake {

  private def fs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = s"$root/_manifest"
  private def epochDir(root: String, epochId: Long) = s"$root/data/epoch=$epochId"

  /** True iff `epochId` has been committed. */
  def isCommitted(spark: SparkSession, root: String, epochId: Long): Boolean =
    fs(spark, root).exists(new Path(s"${manifestDir(root)}/$epochId"))

  /** Write + commit one epoch (idempotent — see the protocol above).
    * `df` must already carry the partition columns. */
  def commitEpoch(df: DataFrame, root: String, epochId: Long): Unit = {
    val spark = df.sparkSession
    if (isCommitted(spark, root, epochId)) return // replayed post-commit epoch
    val target = epochDir(root, epochId)
    val n = spark.sessionState.conf.numShufflePartitions
    df.repartition(n, Schemas.partitionCols.map(col): _*)
      .write.mode("overwrite") // replayed MID-WRITE epoch rewrites, never appends
      .partitionBy(Schemas.partitionCols: _*)
      .parquet(target)
    val f = fs(spark, root)
    f.mkdirs(new Path(manifestDir(root)))
    val tmp = new Path(s"${manifestDir(root)}/.tmp-$epochId")
    val fin = new Path(s"${manifestDir(root)}/$epochId")
    val out = f.create(tmp, true)
    try out.write(target.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, fin) && !f.exists(fin))
      throw new java.io.IOException(s"manifest commit failed for epoch $epochId")
  }

  /** Committed epoch ids, ascending. */
  def committedEpochs(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(manifestDir(root))
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .filterNot(_.startsWith(".")).map(_.toLong).sorted.toSeq
  }

  /** All committed rows — ONLY committed epoch dirs are listed, so a
    * half-written epoch is invisible. `basePath` keeps every partition
    * column (epoch included) in the schema and prunable. */
  def readCommitted(spark: SparkSession, root: String): DataFrame = {
    val epochs = committedEpochs(spark, root)
    require(epochs.nonEmpty, s"no committed epochs under $root")
    spark.read.option("basePath", s"$root/data")
      .parquet(epochs.map(epochDir(root, _)): _*)
  }
}
