package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KEYED MATERIALIZED VIEW over a MERGE lake — the upsert/delete half of
  * incremental view maintenance ([[MaterializedView]] covers the
  * append-only additive half). An upsert is not an additive delta: its
  * group contribution is `new − old`, and `old` needs a per-key lookup.
  * The classic answer (Materialize/DBSP, Flink changelog state) is a
  * KEY INDEX owned by the view, and that is what this maintains:
  *
  * {{{
  *   viewRoot/state_v<cursor>/                 (group, cnt, total)
  *   viewRoot/keyidx/kb=<b>/v<cursor>/         (key, group, value)
  *   viewRoot/_cursor/<cursor>                 (markers; readers take max)
  * }}}
  *
  * The key index is HASH-BUCKETED (`kb = pmod(xxhash64(key), buckets)`)
  * and versioned PER BUCKET: a refresh reads and rewrites ONLY the
  * buckets containing changed keys — cost O(changes + touched buckets),
  * never O(keys) — while untouched buckets stay as their older version
  * dirs (a bucket reader takes its highest version ≤ the committed
  * cursor). Commit is the same versioned-marker protocol as
  * [[MaterializedView]]: state and bucket versions land first, one
  * marker file flips the view, every crash window leaves the previous
  * view intact, and a retry overwrites the same deterministic targets.
  *
  * Group semantics: `cnt`/`total` of live (non-tombstoned) rows per
  * group; a key whose upsert MOVES it between groups contributes −1 to
  * its old group and +1 to the new; groups reaching cnt=0 disappear.
  * Totals are DECIMAL(18,2)-summed — exact and refresh-order-
  * independent. */
object KeyedView {

  val DefaultBuckets = 16

  private def fs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def stateDir(root: String, c: Long) = s"$root/state_v$c"
  private def cursorDir(root: String) = new Path(s"$root/_cursor")
  private def bucketRoot(root: String, b: Long) = s"$root/keyidx/kb=$b"
  private def bucketDir(root: String, b: Long, v: Long) =
    s"${bucketRoot(root, b)}/v$v"
  private def kb(key: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(key), lit(buckets.toLong))

  /** Highest committed cursor; -1 = empty view. */
  def cursor(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    if (!f.exists(cursorDir(root))) -1L
    else f.listStatus(cursorDir(root)).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong)
      .foldLeft(-1L)(math.max)
  }

  /** The committed grouped view. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val c = cursor(spark, root)
    require(c >= 0, s"no committed keyed view under $root")
    spark.read.parquet(stateDir(root, c))
  }

  /** A bucket's live version dir under cursor `c`, if any. */
  private def liveBucketDir(spark: SparkSession, root: String, b: Long,
                            c: Long): Option[String] = {
    val f = fs(spark, root)
    val dir = new Path(bucketRoot(root, b))
    if (!f.exists(dir)) None
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong)
      .filter(_ <= c).sorted.lastOption.map(bucketDir(root, b, _))
  }

  /** The committed key index (all buckets) — O(keys); used by tests and
    * full rebuilds, not by refresh. */
  def readKeyIndex(spark: SparkSession, root: String,
                   buckets: Int = DefaultBuckets): DataFrame = {
    val c = cursor(spark, root)
    require(c >= 0, s"no committed keyed view under $root")
    val dirs = (0L until buckets.toLong)
      .flatMap(liveBucketDir(spark, root, _, c))
    require(dirs.nonEmpty, s"keyed view under $root has an empty key index")
    spark.read.parquet(dirs: _*)
  }

  /** Advance the view over merge lake `lakeRoot` (keyed by `keyCol`,
    * grouped by `groupCol`, summing `valueCol`) to the newest committed
    * epoch. Returns the new cursor. */
  def refresh(spark: SparkSession, lakeRoot: String, viewRoot: String,
              keyCol: String, groupCol: String, valueCol: String,
              buckets: Int = DefaultBuckets): Long = {
    val cur = cursor(spark, viewRoot)
    val epochs = TransactionalLake.committedEpochs(spark, lakeRoot) ++
      TransactionalLake.foldView(spark, lakeRoot).map(_._2.flatMap(_._2))
        .getOrElse(Seq.empty)
    if (epochs.isEmpty) return cur
    val head = epochs.max
    if (head <= cur) return cur
    val op = TransactionalLake.OpCol
    // change rows in (cur, head], resolved to ONE winner per key (the
    // highest epoch in range — several epochs can touch the same key)
    val winsW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("epoch").cast("long").desc)
    val delta = TransactionalLake.changesBetween(spark, lakeRoot, cur, head)
      .select(col(keyCol).as("k"), col(groupCol).as("g"),
        col(valueCol).as("v"), col(op).as("_op"), col("epoch"))
      .withColumn("__rn", row_number().over(winsW))
      .filter(col("__rn") === 1)
      .drop("__rn", "epoch")
      .withColumn("kb", kb(col("k"), buckets))
      .localCheckpoint(true)
    try {
      val touched = delta.select("kb").distinct()
        .collect().map(_.getLong(0)).sorted // ≤ `buckets` values (constant)
      // old rows for the touched buckets only (partition-level pruning by
      // construction: we list exactly those bucket dirs)
      val oldDirs = touched.flatMap(liveBucketDir(spark, viewRoot, _, cur))
      val oldRows =
        if (oldDirs.isEmpty)
          delta.sparkSession.emptyDataFrame
            .withColumn("k", lit(null).cast(delta.schema("k").dataType))
            .withColumn("g", lit(null).cast(delta.schema("g").dataType))
            .withColumn("v", lit(null).cast(delta.schema("v").dataType))
            .limit(0)
        else spark.read.parquet(oldDirs: _*).select("k", "g", "v")
      val changedOld = oldRows.join(delta.select("k").distinct(), Seq("k"),
        "left_semi")
      // group deltas: remove every changed key's old contribution, add
      // the new one for upserts (tombstones add nothing)
      val minus = changedOld.select(col("g"),
        lit(-1L).as("dc"), (col("v").cast("decimal(18,2)") * -1).as("dv"))
      val plus = delta.filter(col("_op") === "u").select(col("g"),
        lit(1L).as("dc"), col("v").cast("decimal(18,2)").as("dv"))
      val groupDelta = minus.unionByName(plus)
        .groupBy("g").agg(sum(col("dc")).cast("long").as("cnt"),
          sum(col("dv")).cast("decimal(28,2)").as("total"))
      val prev =
        if (cur < 0) groupDelta.limit(0)
        else read(spark, viewRoot)
      val state = prev.unionByName(groupDelta)
        .groupBy("g").agg(sum(col("cnt")).cast("long").as("cnt"),
          sum(col("total")).cast("decimal(28,2)").as("total"))
        .filter(col("cnt") > 0)
      state.write.mode("overwrite").parquet(stateDir(viewRoot, head))
      // rewrite ONLY the touched buckets: old rows minus changed keys,
      // plus the new upsert rows. ONE partitioned write job computes the
      // plan once (a write-per-bucket loop re-executes the anti-join per
      // bucket — measured 16x recompute at 16 buckets); the staged
      // kb=<b> dirs then RENAME into their versioned homes (metadata
      // ops; the marker flip below stays the only commit point)
      val newBucketRows = oldRows
        .join(delta.select("k").distinct(), Seq("k"), "left_anti")
        .unionByName(delta.filter(col("_op") === "u").select("k", "g", "v"))
        .withColumn("kb", kb(col("k"), buckets))
      val staging = s"$viewRoot/.staging_v$head"
      val f = fs(spark, viewRoot)
      f.delete(new Path(staging), true)
      newBucketRows.write.partitionBy("kb").parquet(staging)
      touched.foreach { b =>
        val target = new Path(bucketDir(viewRoot, b, head))
        f.delete(target, true) // a crashed prior attempt's partial dir
        f.mkdirs(target.getParent)
        val staged = new Path(s"$staging/kb=$b")
        if (f.exists(staged)) {
          if (!f.rename(staged, target))
            throw new java.io.IOException(
              s"keyed view bucket stage failed for $target")
        } else
          // a touched bucket whose every key tombstoned away still needs
          // its version dir (readers must not fall back to the stale
          // older version): an empty typed parquet write
          newBucketRows.filter(lit(false)).select("k", "g", "v")
            .write.mode("overwrite").parquet(target.toString)
      }
      f.delete(new Path(staging), true)
      // COMMIT: one marker file flips state + every touched bucket
      f.mkdirs(cursorDir(viewRoot))
      val tmp = new Path(s"${cursorDir(viewRoot)}/.tmp-$head")
      val fin = new Path(s"${cursorDir(viewRoot)}/$head")
      val out = f.create(tmp, true)
      try out.write(head.toString.getBytes("UTF-8")) finally out.close()
      if (!f.rename(tmp, fin) && !f.exists(fin))
        throw new java.io.IOException(s"keyed view commit failed for $viewRoot")
      if (cur >= 0) { // cleanup — crash here is harmless
        f.delete(new Path(s"${cursorDir(viewRoot)}/$cur"), false)
        f.delete(new Path(stateDir(viewRoot, cur)), true)
        touched.foreach { b =>
          liveBucketDir(spark, viewRoot, b, cur).filter(_ != bucketDir(viewRoot, b, head))
            .foreach(d => f.delete(new Path(d), true))
        }
      }
      head
    } finally graft.operators.Blocks.release(delta)
  }
}
