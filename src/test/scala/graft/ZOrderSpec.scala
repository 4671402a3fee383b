package graft

import graft.operators.ZOrder
import graft.plans.ZOrderUtil
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order clustering: multi-dimensional range pruning evidence.
  *
  * A linear sort clusters row groups on one column only; the Morton key
  * clusters on both, so 2-D (and other-dimension) range predicates skip
  * row groups via parquet min/max stats. Observable: the scan's
  * `numOutputRows` (rows surviving row-group stats filtering), as in
  * ClusteringSpec.
  */
class ZOrderSpec extends SparkSpec {

  test("interleave2 places bits MSB-first, x above y") {
    // x=1010, y=0101 -> pairs (1,0)(0,1)(1,0)(0,1) -> 10 01 10 01
    assert(ZOrderUtil.interleave2(0xAL, 0x5L, 4) == 0x99L)
    assert(ZOrderUtil.interleave2(0L, 0L, 8) == 0L)
    assert(ZOrderUtil.interleave2(255L, 255L, 8) == 65535L)
    // one step in y moves the key by 1; one step in x by 2 (low bit)
    assert(ZOrderUtil.interleave2(0L, 1L, 8) == 1L)
    assert(ZOrderUtil.interleave2(1L, 0L, 8) == 2L)
  }

  test("zKey scaling is exact integer arithmetic over the full range") {
    import spark.implicits._
    val df = Seq((0L, 0L), (100L, 200L), (50L, 100L)).toDF("x", "y")
    val keys = df.select(ZOrder.zKey(col("x"), 0L, 100L, col("y"), 0L, 200L, 8))
      .as[Long].collect().sorted
    // (0,0) -> (0,0); (100,200) -> (255,255); (50,100) -> (127,127)
    assert(keys(0) == 0L)
    assert(keys(1) == ZOrderUtil.interleave2(127L, 127L, 8))
    assert(keys(2) == 65535L)
  }

  // hash-scrambled 2-D points on a 200x200 grid: arrival order carries
  // no locality, so the unsorted layout's row groups all span the full
  // range of both dimensions
  private def points = spark.range(40000)
    .select((abs(xxhash64(col("id"))) % 200).as("x"),
      (abs(xxhash64(col("id") + 1000000L)) % 200).as("y"))
    .withColumn("payload", concat(lit("p"), col("x"), lit("_"), col("y")))

  /** Rows the parquet scan emitted after row-group stats skipping. */
  private def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(path).filter(pred)
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-order prunes 2-D boxes AND off-axis ranges where a linear sort cannot") {
    val opts = Map("parquet.block.size" -> (32 * 1024).toString)
    val base = tmpDir("zorder_layouts")
    val pts = points.cache()
    try {
      pts.write.options(opts).parquet(s"$base/unsorted")
      pts.orderBy("x").write.options(opts).parquet(s"$base/xsorted")
      ZOrder.zOrdered(pts, "x", "y", bits = 8).drop("z_key")
        .write.options(opts).parquet(s"$base/zordered")

      val box = col("x").between(50, 60) && col("y").between(100, 110)
      val yRange = col("y").between(100, 110)

      // all layouts agree on the answer — layout is semantics-free
      val expect = pts.filter(box).count()
      assert(Seq("unsorted", "xsorted", "zordered").forall(l =>
        spark.read.parquet(s"$base/$l").filter(box).count() == expect))

      val boxU = scannedRows(s"$base/unsorted", box)
      val boxX = scannedRows(s"$base/xsorted", box)
      val boxZ = scannedRows(s"$base/zordered", box)
      val yX = scannedRows(s"$base/xsorted", yRange)
      val yZ = scannedRows(s"$base/zordered", yRange)
      info(s"box: unsorted=$boxU xsorted=$boxX zordered=$boxZ of 40000")
      info(s"y-range: xsorted=$yX zordered=$yZ of 40000")

      // scrambled layout: every row group spans the full range -> no skip
      assert(boxU > 30000L, "unsorted layout should scan ~everything")
      // z-order prunes the box at least 4x better than no clustering
      assert(boxZ * 4 < boxU, s"z-order box scan $boxZ should be <1/4 of unsorted $boxU")
      // the off-axis dimension: x-sort gives y no clustering at all,
      // z-order still prunes it
      assert(yZ * 2 < yX, s"z-order y-range scan $yZ should be <1/2 of x-sorted $yX")
    } finally pts.unpersist()
  }

  test("zone-map box read skips FILES on both dimensions of a z-ordered layout") {
    import graft.operators.ZoneMap
    val base = tmpDir("zorder_zonemap")
    val pts = points.cache()
    try {
      // many files so file-level pruning is observable (range repartition
      // of the Morton key into 16 near-disjoint key ranges)
      ZOrder.zOrdered(pts, "x", "y", bits = 8, numFiles = Some(16))
        .drop("z_key").write.parquet(s"$base/z")
      val stats = ZoneMap.buildStatsMulti(spark, s"$base/z", Seq("x", "y"))
        .cache()
      val total = stats.count()
      assert(total >= 8, s"fixture must produce several files, got $total")
      def kept(box: Seq[(String, Long, Long)]): Long =
        stats.filter(box.map { case (c, lo, hi) =>
          col(s"max_$c") >= lo && col(s"min_$c") <= hi
        }.reduce(_ && _)).count()
      val box = Seq(("x", 50L, 60L), ("y", 100L, 110L))
      val keptBox = kept(box)
      val keptX = kept(box.take(1))
      val keptY = kept(box.drop(1))
      info(s"files: total=$total box=$keptBox x-only=$keptX y-only=$keptY")
      // EACH dimension alone skips files — the property a linear sort
      // only has on its sort column — and the box compounds them
      assert(keptX < total, s"x-range should skip files ($keptX of $total)")
      assert(keptY < total, s"y-range should skip files ($keptY of $total)")
      assert(keptBox <= math.min(keptX, keptY),
        "box pruning must be at least as strong as each dimension alone")
      assert(keptBox * 2 <= total,
        s"a quarter-width box should keep at most half the files " +
          s"($keptBox of $total)")
      // pruning never changes answers: pruned read ≡ brute force
      val brute = pts.filter(col("x").between(50, 60) &&
        col("y").between(100, 110))
        .groupBy("x", "y").count().collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val pruned = ZoneMap.prunedBoxRead(spark, stats, box,
        requirePruned = true)
        .groupBy("x", "y").count().collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(pruned == brute)
      stats.unpersist()
    } finally { pts.unpersist(); () }
  }

  test("box read works over int-typed stat columns (envelopes cast, not assumed)") {
    import graft.operators.ZoneMap
    val base = tmpDir("zorder_zonemap_int")
    spark.range(4000).select(
      (col("id") % 100).cast("int").as("x"),
      (col("id") % 61).cast("int").as("y"))
      .repartitionByRange(8, col("x"))
      .write.parquet(s"$base/z")
    val stats = ZoneMap.buildStatsMulti(spark, s"$base/z", Seq("x", "y"))
    val got = ZoneMap.prunedBoxRead(spark, stats,
      Seq(("x", 10L, 30L), ("y", 0L, 60L)))
      .count()
    val brute = spark.read.parquet(s"$base/z")
      .filter(col("x").between(10, 30) && col("y").between(0, 60)).count()
    assert(got == brute && got > 0)
  }
}
