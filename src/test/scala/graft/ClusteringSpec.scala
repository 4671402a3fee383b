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

  test("bucketing + in-bucket sort: shuffle-free join AND row-group skipping on ONE layout") {
    // the two write-time layout levers compose on one table: bucketBy
    // (join key) kills the recurring join's exchanges AND prunes
    // equality scans to one bucket; sortBy inside each bucket file keeps
    // row-group min/max narrow so the scan also skips WITHIN the
    // surviving bucket — measured against an unsorted-bucketed twin
    // where every row group of the bucket covers the probed key
    val hconf = spark.sparkContext.hadoopConfiguration
    val prevBlock = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 32 * 1024)
    try {
      Seq("bs_fact", "bs_fact_nosort", "bs_dim").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        org.apache.hadoop.fs.FileSystem.get(hconf).delete(
          new org.apache.hadoop.fs.Path(
            s"${spark.sessionState.conf.warehousePath}/$t"), true)
      }
      // repartition by the bucket key first: ONE file per bucket (a
      // writer task per bucket) instead of files × tasks — the layout
      // discipline that keeps both file counts and row-group runs tight
      val fact = spark.range(200000)
        .select((col("id") % 64).as("k"),
          abs(xxhash64(col("id"))).as("event_id"))
        .repartition(8, col("k"))
      fact.write.bucketBy(8, "k").sortBy("k", "event_id").saveAsTable("bs_fact")
      fact.write.bucketBy(8, "k").saveAsTable("bs_fact_nosort")
      spark.range(64).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
        .write.bucketBy(8, "k").saveAsTable("bs_dim")

      // 1) the co-located join plans with no join-side exchange (count on
      // the pre-execution plan — the AQE-finalized string repeats the
      // aggregate's one exchange in both its final and initial sections)
      val joined = spark.table("bs_fact")
        .join(spark.table("bs_dim").hint("merge"), "k")
        .groupBy("name").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(exchanges <= 1,
        s"bucketed join must not shuffle its inputs (found $exchanges)")
      assert(joined.count() == 64)

      // 2) RANGE predicate on (k, event_id): both tables bucket-prune to
      // 1 of 8 buckets, but only the sorted layout's row groups have
      // narrow event_id ranges inside the bucket file, so min/max stats
      // skip groups. (A POINT predicate would not separate the layouts —
      // parquet dictionary filtering already rejects row groups whose
      // dictionary lacks the exact value, sorted or not.)
      val bounds = spark.table("bs_fact").filter(col("k") === 7)
        .agg(min(col("event_id")), max(col("event_id"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val width = (hi - lo) / 50 // a ~2% slice of k=7's value range
      // autoBucketedScan turns the bucketed scan OFF for join-less
      // queries (it only helps joins/aggs) — which also forfeits bucket
      // PRUNING; pin it on for the range-scan comparison
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      def scanned(table: String): Long = {
        val q = spark.table(table)
          .filter(col("k") === 7 && col("event_id").between(lo, lo + width))
        assert(q.collect().length >= 1) // executes THIS plan (count() would plan anew)
        val scans = q.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec =>
            assert(s.toString.contains("SelectedBucketsCount: 1 out of 8"),
              s"equality on the bucket column must prune buckets: $s")
            s.metrics("numOutputRows").value
        }
        scans.sum
      }
      val sorted = scanned("bs_fact")
      val unsorted = scanned("bs_fact_nosort")
      info(s"scanned rows: sorted=$sorted unsorted=$unsorted of 200000")
      assert(sorted < unsorted / 4,
        s"in-bucket sort must add row-group skipping beyond bucket pruning: " +
          s"$sorted vs $unsorted")
    } finally {
      if (prevBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", prevBlock)
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    }
  }

  test("q_clustered_join_scan: shuffle-free join + pushed sort-column range on one layout") {
    // the gated query's own require already fails on join-side
    // exchanges; here additionally pin that the range predicate on the
    // SECOND sort column reaches the parquet scan (row-group stats
    // filtering needs the pushed filter) and results are non-trivial
    val q = graft.queries.Analytics.clusteredJoinScan(spark, sf0001)
    val rows = q.collect()
    assert(rows.length > 1)
    // the AQE-finalized plan string carries the scans' PushedFilters
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(l_orderkey,7500)"),
      s"sort-column range predicate must reach the fact scan:\n${plan.take(1200)}")
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
