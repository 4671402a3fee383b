package graft

import graft.sources.TransactionalLake
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Vacuum safety contracts beyond the driver-gated pipe_vacuum
  * end-to-end: the age horizon protects concurrent writers, committed
  * state and replay markers are untouchable, and the committed view is
  * invariant across vacuum. */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def fsys = org.apache.hadoop.fs.FileSystem
    .get(spark.sparkContext.hadoopConfiguration)

  private def buildLake(root: String): Unit = {
    val df = (1L to 30L).toDF("event_id")
      .withColumn("event_type", lit("view"))
    (0 until 3).foreach(i => TransactionalLake.commitEpoch(
      df.filter(col("event_id") % 3 === i), root, i.toLong,
      partitionCols = Nil))
    assert(TransactionalLake.foldCommittedEpochs(spark, root, upTo = 1L,
      partitionCols = Nil) == 2)
  }

  test("fresh uncommitted epoch dirs survive a real horizon (concurrent writer)") {
    val root = tmpDir("vac_horizon")
    buildLake(root)
    (1L to 3L).toDF("event_id").write.parquet(s"$root/data/epoch=50")
    // default 24 h horizon: the just-written dir is an in-flight writer
    val removed = TransactionalLake.vacuum(spark, root)
    assert(fsys.exists(new Path(s"$root/data/epoch=50")),
      "fresh uncommitted epoch must survive the horizon")
    // zero horizon: it is debris
    assert(TransactionalLake.vacuum(spark, root, olderThanMs = 0L) >= 1)
    assert(!fsys.exists(new Path(s"$root/data/epoch=50")))
    assert(removed == 0, s"nothing else was debris, removed $removed")
  }

  test("vacuum never touches committed state, markers, or the view") {
    val root = tmpDir("vac_invariant")
    buildLake(root)
    val before = TransactionalLake.readCommitted(spark, root)
      .select("event_id", "event_type").as[(Long, String)].collect().sorted.toSeq
    (1L to 3L).toDF("event_id").write.parquet(s"$root/data_folded/gen=77")
    assert(TransactionalLake.vacuum(spark, root, olderThanMs = 0L) == 1)
    assert(!fsys.exists(new Path(s"$root/data_folded/gen=77")))
    // replay markers intact → replayed folded epochs stay no-ops
    assert(TransactionalLake.isCommitted(spark, root, 0L))
    assert(TransactionalLake.isCommitted(spark, root, 1L))
    val after = TransactionalLake.readCommitted(spark, root)
      .select("event_id", "event_type").as[(Long, String)].collect().sorted.toSeq
    assert(after === before)
    // idempotent: a second vacuum finds nothing
    assert(TransactionalLake.vacuum(spark, root, olderThanMs = 0L) == 0)
  }

  test("leftover live dir of a folded epoch is reclaimed regardless of age") {
    val root = tmpDir("vac_folded")
    buildLake(root)
    (1L to 3L).toDF("event_id").write.parquet(s"$root/data/epoch=0")
    val before = TransactionalLake.readCommitted(spark, root).count()
    // large horizon: rule 2 needs none (the view is published)
    assert(TransactionalLake.vacuum(spark, root) == 1)
    assert(!fsys.exists(new Path(s"$root/data/epoch=0")))
    assert(TransactionalLake.readCommitted(spark, root).count() === before)
  }
}
