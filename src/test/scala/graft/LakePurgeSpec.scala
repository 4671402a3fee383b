package graft

import graft.ingest.Ingest
import graft.sources.{Lake, TransactionalLake}
import org.apache.spark.sql.functions._

/** Tenant offboarding: partition-scoped purge across the plain lake and
  * the transactional epochs, with the survivors untouched byte-for-byte
  * and the purged tenant unable to resurrect from crash replay or from a
  * later fold. */
class LakePurgeSpec extends SparkSpec {

  private def enriched(idMax: Int) = {
    val ev = Tables.load(spark, sf0001, "events")
      .filter(col("event_id") <= idMax)
    Ingest.derivePartitions(Ingest.enrich(ev,
      concat(lit("t"), (col("user_id") % 3).cast("string")),
      unix_timestamp(col("ts"))))
      .select(col("event_id"), col("event_type"), col("value"),
        col("tenant"), col("year"), col("month"), col("day"), col("hour"))
  }

  private def fileChecksums(root: String): Map[String, Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
    val b = Map.newBuilder[String, Long]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) b += (f.getPath.toString -> (f.getLen ^ f.getModificationTime))
    }
    b.result()
  }

  test("plain-lake purge: tenant gone, survivors byte-identical, catalog dropped") {
    val root = tmpDir("purge_lake")
    val tbl = "purge_spec_events"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Lake.writeValid(enriched(500), root)
    Lake.writeErrors(
      spark.range(9).select(col("id").as("event_id"),
        concat(lit("t"), (col("id") % 3).cast("string")).as("tenant_key"),
        lit("event-error").as("error_type")), root)
    Lake.registerExternal(spark, tbl, s"$root/data")
    val beforeOthers = fileChecksums(s"$root/data")
      .filterNot(_._1.contains("tenant=t2"))
    Lake.purgeTenant(spark, tbl, root, "t2")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/data/tenant=t2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_purged/t2")))
    assert(fileChecksums(s"$root/data").filterNot(_._1.contains("tenant=t2"))
      == beforeOthers, "other tenants' files must be untouched")
    assert(spark.table(tbl).filter(col("tenant") === "t2").isEmpty)
    assert(spark.sessionState.catalog.listPartitions(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl),
      Some(Map("tenant" -> "t2"))).isEmpty)
    val errs = spark.read.parquet(s"$root/error")
    assert(errs.filter(col("tenant_key") === "t2").isEmpty)
    assert(errs.count() == 6, "non-t2 error rows survive")
    // idempotent
    Lake.purgeTenant(spark, tbl, root, "t2")
    assert(spark.table(tbl).filter(col("tenant") === "t2").isEmpty)
  }

  test("usage accounting reflects the lake and drops a purged tenant") {
    val root = tmpDir("usage_lake")
    val tbl = "usage_spec_events"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val df = enriched(500)
    Lake.writeValid(df, root)
    Lake.registerExternal(spark, tbl, s"$root/data")
    val usage = Lake.usageByTenant(spark, tbl).collect()
      .map(r => r.getString(0) -> r).toMap
    val expected = df.groupBy("tenant").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(usage.keySet == expected.keySet)
    expected.foreach { case (t, n) =>
      val u = usage(t)
      assert(u.getAs[Long]("n_rows") == n)
      assert(u.getAs[Long]("n_partitions") > 0)
      assert(u.getAs[Long]("n_files") > 0 && u.getAs[Long]("n_bytes") > 0)
    }
    val before = Lake.usageByTenant(spark, tbl)
      .filter(col("tenant") =!= "t1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_bytes"))).toSet
    Lake.purgeTenant(spark, tbl, root, "t1")
    val after = Lake.usageByTenant(spark, tbl).collect()
    assert(!after.exists(_.getString(0) == "t1"), "purged tenant leaves metering")
    assert(after.map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_bytes"))).toSet
      == before, "survivors' accounting unchanged by the purge")
  }

  test("transactional purge spans live epochs + folded generations; replay and fold stay clean") {
    val root = tmpDir("purge_tx")
    val df = enriched(500)
    (0 until 3).foreach(i =>
      TransactionalLake.commitEpoch(df.filter(col("event_id") % 3 === i), root, i.toLong))
    // age epochs 0,1 into a folded generation FIRST so the purge must
    // reach inside the consolidated generation too
    assert(TransactionalLake.foldCommittedEpochs(spark, root, upTo = 1L) == 2)
    val expectOthers = df.filter(col("tenant") =!= "t2").count()
    assert(TransactionalLake.purgeTenant(spark, root, "t2") >= 2,
      "must remove subtrees from both the generation and the live epoch")

    def committed = TransactionalLake.readCommitted(spark, root)
    assert(committed.filter(col("tenant") === "t2").isEmpty)
    assert(committed.count() == expectOthers)
    // crash replay of a FOLDED epoch and of a LIVE epoch: both no-ops
    TransactionalLake.commitEpoch(df.filter(col("event_id") % 3 === 0), root, 0L)
    TransactionalLake.commitEpoch(df.filter(col("event_id") % 3 === 2), root, 2L)
    assert(committed.filter(col("tenant") === "t2").isEmpty,
      "purged tenant must not resurrect from replayed commits")
    assert(committed.count() == expectOthers)
    // a LATER fold carries the purge into the next generation
    assert(TransactionalLake.foldCommittedEpochs(spark, root, upTo = 2L) == 1)
    assert(committed.filter(col("tenant") === "t2").isEmpty)
    assert(committed.count() == expectOthers)
  }
}
