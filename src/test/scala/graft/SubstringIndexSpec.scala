package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Incremental substring-dedup index ([[Dedup.commitSubstringBatch]]):
  * the index-served per-doc longest repeat must equal the one-shot
  * [[Dedup.longestDupSubstrings]] on the union corpus — including
  * repeats whose two sides land in DIFFERENT batches (the later batch
  * must also improve the EARLIER doc's best) — and survive crash
  * replays, retention folds, and the in-plan anchor budget. */
class SubstringIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() = tmpDir("ssidx_")

  private val shared = (1 to 12).map(i => s"common$i").mkString(" ")
  private def filler(i: Long, n: Int) =
    (1 to n).map(k => s"u${i}w$k").mkString(" ")
  // doc 1 (batch 1: 1 % 3): carries `shared` early; doc 6 (batch 0):
  // carries it late — a CROSS-BATCH repeat, plus a same-batch pair
  // (3, 9) and repeat-free docs
  private val corpus = Seq(
    (1L, s"$shared ${filler(1, 20)}"),
    (2L, filler(2, 25)),
    (3L, s"${filler(3, 5)} $shared ${filler(33, 5)}"),
    (6L, s"${filler(6, 9)} $shared"),
    (9L, s"${filler(9, 11)} $shared ${filler(99, 3)}"),
    (10L, filler(10, 30))).toDF("doc_id", "text")

  private def commitAll(root: String): Unit =
    (0 until 3).foreach(i => Dedup.commitSubstringBatch(
      corpus.filter(col("doc_id") % 3 === i), "doc_id", "text", root,
      i.toLong))

  private def served(root: String): Map[Long, (Long, Long)] =
    Dedup.longestDupSubstringsFromIndex(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private lazy val oneShot: Map[Long, (Long, Long)] =
    Dedup.longestDupSubstrings(corpus, "doc_id", "text", minWords = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("index-served == one-shot, including cross-batch repeats") {
    val root = freshRoot()
    commitAll(root)
    assert(served(root) === oneShot)
    // the planted repeats actually exercise both cases
    assert(oneShot.keySet === Set(1L, 3L, 6L, 9L))
    assert(oneShot(1L)._1 === 12L) // the 12-word shared run
  }

  test("index-served == one-shot on the sf0.001 documents table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val root = freshRoot()
    (0 until 3).foreach(i => Dedup.commitSubstringBatch(
      docs.filter(col("doc_id") % 3 === i), "doc_id", "text", root, i.toLong))
    val inc = served(root)
    val one = Dedup.longestDupSubstrings(docs, "doc_id", "text", minWords = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc === one)
  }

  test("epoch replay is a no-op; a fold keeps the read identical") {
    val root = freshRoot()
    commitAll(root)
    val before = served(root)
    // crash-replay: re-commit an already-committed batch
    Dedup.commitSubstringBatch(corpus.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", root, 1L)
    assert(served(root) === before)
    // retention fold of the aged epochs
    assert(Dedup.foldSubstringIndex(spark, root, upTo = 1L) === ((2, 2)))
    assert(served(root) === before)
  }

  test("streamed index (with forced crash replay) == one-shot") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val base = tmpDir("ssub_stream_")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach(i => corpus.filter(col("doc_id") % 3 === i)
      .coalesce(1).write.mode("append").json(s"$base/in"))
    def run(): Unit = graft.streaming.StreamingIngest.awaitWithRestartRetry(() =>
      graft.streaming.StreamingDedup.startSubstringIndex(
        spark.readStream.schema(StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType))))
          .option("maxFilesPerTrigger", 1).json(s"$base/in"),
        "doc_id", "text", s"$base/idx", s"$base/ckpt",
        org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    run()
    // crash: drop the final stream commit; the replayed epoch must be
    // absorbed by the idempotent grams/best commits
    val commits = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$base/ckpt/commits"))
      .map(_.getPath.getName).filterNot(_.startsWith(".")).map(_.toLong).sorted
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$base/ckpt/commits/${commits.last}"), false)
    run()
    assert(served(s"$base/idx") === oneShot)
  }

  test("duplicationReport aggregates per-doc repeats by source") {
    val df = corpus.withColumn("source",
      when(col("doc_id") <= 6, "sA").otherwise("sB"))
    val got = graft.operators.TextAnalysis
      .duplicationReport(df, "doc_id", "text", "source", minWords = 8)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    val tokens = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .count(_.nonEmpty).toLong).toMap
    def expect(ids: Seq[Long]) = {
      val dups = ids.flatMap(id => oneShot.get(id).map(_._1))
      (ids.size.toLong, dups.size.toLong,
        if (dups.isEmpty) 0L else dups.max,
        java.math.BigDecimal.valueOf(
          dups.sum.toDouble / ids.map(tokens).sum.toDouble)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    }
    assert(got("sA") === expect(Seq(1L, 2L, 3L, 6L)))
    assert(got("sB") === expect(Seq(9L, 10L)))
  }

  test("pre-upgrade root (gram epochs without df deltas) is backfilled") {
    val root = freshRoot()
    // build epoch 0 (docs 3, 6, 9 — the same-batch `shared` pairs),
    // then simulate a root committed by the pre-df-artifact version:
    // delete the df lake entirely
    Dedup.commitSubstringBatch(corpus.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", root, 0L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/df"), true))
    // epoch 1 carries doc 1, whose only repeat partners live in epoch
    // 0: its anchor keys need CORPUS df >= 2, and the batch's own df
    // delta alone reads df = 1 for them — without the backfill the
    // gate would silently drop doc 1's repeat and served() would
    // diverge from the one-shot
    (1 until 3).foreach(i => Dedup.commitSubstringBatch(
      corpus.filter(col("doc_id") % 3 === i), "doc_id", "text", root,
      i.toLong))
    assert(served(root) === oneShot)
    assert(served(root).contains(1L))
    // df lake now covers every gram epoch again
    val gramEpochs = graft.sources.TransactionalLake
      .committedEpochs(spark, s"$root/grams").toSet
    val dfEpochs = graft.sources.TransactionalLake
      .committedEpochs(spark, s"$root/df").toSet
    assert(gramEpochs === dfEpochs)
  }

  test("anchor budget refuses loudly at commit time") {
    val root = freshRoot()
    val same = (1 to 10).map(i => s"b$i").mkString(" ")
    val spam = (1L to 30L).map(i => i -> same).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.commitSubstringBatch(spam, "doc_id", "text", root, 0L,
        maxAnchorPairs = 10L)
    }
    assert(e.getMessage != null && e.getMessage.contains("maxAnchorPairs"))
  }
}
