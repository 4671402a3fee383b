package graft

import graft.sources.TransactionalLake
import graft.streaming.StreamingIngest
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** Manifest-committed sink: exactly-once delivery under BOTH crash
  * points of the epoch protocol (the driver-gated
  * `pipe_streaming_transactional` covers the mid-write crash end-to-end;
  * here both failure windows and the reader invariants are pinned). */
class TransactionalSpec extends SparkSpec {
  import spark.implicits._

  private def writeInput(in: String): Unit =
    Seq(
      ("""{"Data":{"event":"e1","region":"US","device":"TV"}}""", "acme"),
      ("""{"Data":{"event":"e2","region":"EU","device":"web"}}""", "globex"),
      ("""{"Data":{"event":"e3","region":"US","device":"app"}}""", "acme"))
      .toDF("value", "tenant_key").write.mode("overwrite").json(in)

  private def run(in: String, lake: String, ckpt: String): Unit =
    StreamingIngest.awaitWithRestartRetry { () =>
      val raw = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("tenant_key",
            org.apache.spark.sql.types.StringType))))
        .json(in)
      StreamingIngest.startTransactional(spark, raw, "value",
        "tenant_key", lake, ckpt, Trigger.AvailableNow(), ingestTs = lit(1704067200L))
    }

  private def snapshot(lake: String): Seq[Row] =
    TransactionalLake.readCommitted(spark, lake)
      .select("device", "event", "region", "tenant", "year", "month", "day", "hour")
      .orderBy("device").collect().toSeq
  private type Row = org.apache.spark.sql.Row

  test("replay after EITHER crash point delivers exactly-once with no dedup") {
    val in = tmpDir("tx_in"); val lake = tmpDir("tx_lake"); val ckpt = tmpDir("tx_ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    writeInput(in)
    run(in, lake, ckpt)
    val baseline = snapshot(lake)
    assert(baseline.size == 3)
    assert(TransactionalLake.committedEpochs(spark, lake) == Seq(0L))

    // crash A: between manifest commit and checkpoint commit → the
    // replayed epoch is already committed and must SKIP
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/commits/0"), false)
    run(in, lake, ckpt)
    assert(snapshot(lake) == baseline, "post-commit replay must skip")

    // crash B: between data write and manifest commit → the replayed
    // epoch REWRITES its own directory and re-commits, never appends
    fs.delete(new org.apache.hadoop.fs.Path(s"$lake/_manifest/0"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/commits/0"), false)
    run(in, lake, ckpt)
    assert(snapshot(lake) == baseline, "mid-write replay must rewrite in place")
    assert(TransactionalLake.committedEpochs(spark, lake) == Seq(0L))
  }

  test("uncommitted epochs are invisible to readers") {
    val lake = tmpDir("tx_invis")
    val df = Seq((1L, "a")).toDF("event_id", "payload")
      .withColumn("tenant", lit("t0")).withColumn("year", lit("2024"))
      .withColumn("month", lit("05")).withColumn("day", lit("01"))
      .withColumn("hour", lit("00"))
    TransactionalLake.commitEpoch(df, lake, 0L)
    // epoch 1 data lands WITHOUT a manifest entry (simulated torn write)
    df.withColumn("payload", lit("torn"))
      .write.mode("overwrite")
      .partitionBy("tenant", "year", "month", "day", "hour")
      .parquet(s"$lake/data/epoch=1")
    val seen = TransactionalLake.readCommitted(spark, lake)
    assert(seen.count() == 1)
    assert(seen.select("payload").as[String].head() == "a",
      "torn epoch must be invisible")
    // committing it makes it visible
    TransactionalLake.commitEpoch(df.withColumn("payload", lit("now")), lake, 1L)
    assert(TransactionalLake.readCommitted(spark, lake).count() == 2)
  }
}
