package graft

import graft.sources.Lake
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Write-time data clustering: `writeValid(sortCols = ...)` must produce
  * row groups with narrow min/max ranges on the sort column so selective
  * non-partition predicates skip row groups via pushed-down stats. The
  * observable is the scan's `numOutputRows` metric: rows surviving the
  * row-group-level filter, BEFORE the post-scan filter. */
class ClusteringSpec extends SparkSpec {

  // ids SCRAMBLED by hash: without clustering every row group's [min,max]
  // spans the whole id range (spark.range order would otherwise survive
  // the shuffle and make even the unsorted write accidentally clustered)
  private def rows = spark.range(20000)
    .select(abs(xxhash64(col("id"))).as("event_id"))
    .withColumn("payload", concat(lit("p"), col("event_id")))
    .withColumn("tenant", lit("t0")).withColumn("year", lit("2024"))
    .withColumn("month", lit("04")).withColumn("day", lit("01"))
    .withColumn("hour", lit("00"))

  private lazy val probeId: Long = rows.select("event_id").head().getLong(0)

  /** Rows the parquet scan emitted (after row-group stats skipping). */
  private def scannedRows(path: String): Long = {
    val df = spark.read.parquet(path).filter(col("event_id") === probeId)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }
    scans.sum
  }

  test("sortCols clustering lets selective predicates skip row groups") {
    // small row groups so one file holds MANY groups (default 128 MiB
    // would put the whole fixture in one group and hide the effect)
    val opts = Map("parquet.block.size" -> (32 * 1024).toString)
    val clustered = tmpDir("cluster_on")
    val unclustered = tmpDir("cluster_off")
    Lake.writeValid(rows, clustered, sortCols = Seq("event_id"), writerOptions = opts)
    Lake.writeValid(rows, unclustered, writerOptions = opts)

    val hit = scannedRows(s"$clustered/data")
    val miss = scannedRows(s"$unclustered/data")
    info(s"scanned rows: clustered=$hit unclustered=$miss of 20000")
    assert(hit > 0, "the probed row must be found")
    // clustered: only the one row group containing the key survives the
    // stats filter; unclustered: hash-ordered ids make every row group's
    // [min,max] cover the key, so nothing skips
    assert(hit < miss / 4,
      s"clustering must skip most row groups: scanned $hit vs $miss")
    // identical content either way
    assert(spark.read.parquet(s"$clustered/data").count() == 20000)
  }

  test("compact(sortCols) clusters the rewritten partitions") {
    val root = tmpDir("compact_cluster")
    spark.sql("DROP TABLE IF EXISTS compact_cluster_tbl")
    val hconf = spark.sparkContext.hadoopConfiguration
    val prevBlock = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 32 * 1024)
    try {
      // three small unsorted appends — the classic fragmented state
      (1 to 3).foreach(_ => Lake.writeValid(rows, root))
      Lake.registerExternal(spark, "compact_cluster_tbl", s"$root/data")
      val before = scannedRows(s"$root/data")
      Lake.compact(spark, "compact_cluster_tbl", "tenant = 't0'",
        sortCols = Seq("event_id"))
      val after = scannedRows(s"$root/data")
      info(s"scanned rows: before=$before after-compact=$after of 60000")
      assert(spark.table("compact_cluster_tbl").count() == 60000,
        "compaction must preserve every row")
      assert(after < before / 4,
        s"clustered compaction must skip most row groups: $after vs $before")
    } finally {
      if (prevBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", prevBlock)
    }
  }
}
