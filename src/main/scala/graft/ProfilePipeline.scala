package graft

import graft.ingest.Ingest
import graft.sources.Lake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the lake/streaming pipeline hot path. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
      r
    }

    val root = "/root/repo/target/tmp/profile_lake"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.sql("DROP TABLE IF EXISTS profile_tbl")

    val events = Tables.load(spark, sfDir, "events")
    time("warmup count")(events.count())
    val tenantCol = concat(lit("t"), (col("user_id") % 3).cast("string"))
    val enriched = Ingest.derivePartitions(
      Ingest.enrich(events, tenantCol, unix_timestamp(col("ts"))))
      .select(col("event_id"), col("event_type"), col("value"),
        col("tenant"), col("year"), col("month"), col("day"), col("hour"))
    time("enrich+derive (no write)")(enriched.count())
    time("writeValid dynamic-partition write")(Lake.writeValid(enriched, root))
    time("registerExternal (create+recoverPartitions)")(
      Lake.registerExternal(spark, "profile_tbl", s"$root/data"))
    time("tenant query via table")(
      spark.table("profile_tbl").filter(col("tenant") === "t1").count())
    time("tenant query again (warm cache)")(
      spark.table("profile_tbl").filter(col("tenant") === "t1").count())
    time("full table scan via table")(spark.table("profile_tbl").count())

    // ---- streaming-roundtrip micro-batch breakdown (r12 stretch #8:
    // attribute the 22-32 k rec/s clean-run ingest swing). Repeats the
    // gated entry's exact pipeline with a progress listener splitting
    // each micro-batch's wall into the engine's phases; rec/s is
    // events/entry-wall, so the swing must live in one of these. ----
    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          progress.add(e.progress); ()
        }
        override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    (1 to 4).foreach { rep =>
      progress.clear()
      val df = graft.queries.PipelineQueries.queries("pipe_streaming_roundtrip")(
        spark, sfDir)
      val t0 = System.nanoTime()
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      // the listener bus is ASYNC: the final batch's progress event can
      // arrive after count() returns and misattribute phases to the next
      // rep — wait until the queue is quiet before reading it
      var stable = 0
      var lastSize = -1
      var waits = 0
      while (stable < 3 && waits < 100) { // 3 x 100 ms quiet, cap 10 s
        val s = progress.size
        if (s == lastSize) stable += 1 else { stable = 0; lastSize = s }
        Thread.sleep(100); waits += 1
      }
      val ps = progress.asScala.toSeq
      val rows = ps.map(_.numInputRows).sum
      def dur(k: String) = ps.map(p =>
        Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)).sum / 1e3
      println(f"[rt-prof] rep$rep wall=$wall%.2f out=$n rows=$rows " +
        f"batches=${ps.size} addBatch=${dur("addBatch")}%.2f " +
        f"trigger=${dur("triggerExecution")}%.2f " +
        f"getBatch=${dur("getBatch")}%.2f latestOffset=${dur("latestOffset")}%.2f " +
        f"commit=${dur("commitOffsets")}%.2f walCommit=${dur("walCommit")}%.2f " +
        f"queryPlanning=${dur("queryPlanning")}%.2f")
    }
    spark.stop()
  }
}
