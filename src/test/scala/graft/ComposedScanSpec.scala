package graft

import graft.operators.{BloomIndex, ComposedScan, ZoneMap}
import org.apache.spark.sql.functions._

/** Composed bloom × zone-map skipping: the intersection listing must
  * strictly beat each index alone on a layout where the two predicates
  * are independent (range cut follows the layout, membership cut
  * follows content), and must never change answers. */
class ComposedScanSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(root: String): Unit =
    // 20k unique events over 200 users, range-clustered on USER into 16
    // files — the user-range predicate prunes by layout, the (unique)
    // event-id probe by per-file membership. Membership pruning needs
    // key cardinality >> rows-per-file: a low-cardinality key (e.g. the
    // 200 users) appears in EVERY 1250-row file and blooms keep all.
    spark.range(20000).select(
      col("id").as("event_id"),
      (col("id") % 200).as("user_id"),
      (col("id") % 97).cast("double").as("value"))
      .repartitionByRange(16, col("user_id"))
      .write.parquet(s"$root/data")

  test("intersection listing strictly beats each index alone; answers exact") {
    val root = tmpDir("cmps_fix")
    fixture(root)
    val bloom = BloomIndex.buildIndex(spark, s"$root/data", "event_id")
    val stats = ZoneMap.buildStats(spark, s"$root/data", "user_id")
    // users 5 (in [0, 49]), 199 and 167 (outside): one event lands in
    // the user range, two prune on the zone side; the bloom side keeps
    // ~one file per probed event
    val events = Seq(1205L, 9999L, 14567L)
    val (bKeep, total) = BloomIndex.candidateFiles(spark, bloom, events)
    val (zKeep, _) = ZoneMap.candidateFilesRange(stats, 0L, 49L)
    val composed = bKeep.toSet.intersect(zKeep.toSet)
    info(s"files: total=$total bloom=${bKeep.length} zone=${zKeep.length} " +
      s"composed=${composed.size}")
    assert(zKeep.length < total, "range must prune on this layout")
    assert(bKeep.length < total, "membership must prune on this layout")
    assert(composed.size < math.min(bKeep.length, zKeep.length),
      "the intersection must strictly beat each index alone here")
    val got = ComposedScan.bloomZoneRead(spark, bloom, "event_id", events,
      stats, "user_id", 0L, 49L, requirePruned = true)
      .select("event_id", "user_id").as[(Long, Long)].collect().toSet
    val brute = spark.read.parquet(s"$root/data")
      .filter(col("event_id").isin(events: _*) &&
        col("user_id").between(0, 49))
      .select("event_id", "user_id").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture must select something")
  }

  test("empty intersection returns an empty frame with the table schema") {
    val root = tmpDir("cmps_empty")
    fixture(root)
    val bloom = BloomIndex.buildIndex(spark, s"$root/data", "event_id")
    val stats = ZoneMap.buildStats(spark, s"$root/data", "user_id")
    // a range beyond the data: zone maps admit nothing
    val got = ComposedScan.bloomZoneRead(spark, bloom, "event_id", Seq(7L),
      stats, "user_id", 100000L, 200000L)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("event_id", "user_id", "value"))
  }

  test("mismatched index snapshots fail loud") {
    val root = tmpDir("cmps_mismatch")
    fixture(root)
    val bloom = BloomIndex.buildIndex(spark, s"$root/data", "event_id")
    val stats = ZoneMap.buildStats(spark, s"$root/data", "user_id").limit(3)
    val ex = intercept[IllegalArgumentException] {
      ComposedScan.bloomZoneRead(spark, bloom, "event_id", Seq(7L),
        stats, "user_id", 0L, 100L)
    }
    assert(ex.getMessage.contains("different snapshots"))
  }
}
