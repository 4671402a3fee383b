package graft

import graft.sources.TransactionalLake
import org.apache.spark.sql.functions._

/** diffSnapshots / readMergedAsOf contracts beyond the driver-gated
  * pipe_snapshot_diff end-to-end path: classification completeness,
  * null-field rows under null-safe struct equality, schema guard, and
  * the as-of view's latest-wins + horizon behavior. Also q_dq_audit /
  * q_scd2_intervals invariants on real tables. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diffSnapshots classifies added/removed/changed and drops unchanged") {
    val a = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "s", "v")
    val b = Seq((2L, "b", 2.0), (3L, "c", 30.0), (4L, "d", 4.0))
      .toDF("id", "s", "v")
    val d = TransactionalLake.diffSnapshots(a, b, Seq("id"))
      .select("id", "change_type").as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("diffSnapshots is null-safe on data fields") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("id", "s")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("y")))
      .toDF("id", "s")
    val d = TransactionalLake.diffSnapshots(a, b, Seq("id"))
      .select("id", "change_type").as[(Long, String)].collect().toMap
    // id 1: null == null → unchanged (dropped); 2 and 3: null vs value → changed
    assert(d === Map(2L -> "changed", 3L -> "changed"))
  }

  test("diffSnapshots is null-safe on KEY columns") {
    // a null-keyed row present in both snapshots must meet its
    // counterpart (one unchanged/changed row), never surface as a
    // spurious removed+added pair
    val a = Seq((Option.empty[java.lang.Long], "x"), (Some(1L: java.lang.Long), "p"))
      .toDF("id", "s")
    val b = Seq((Option.empty[java.lang.Long], "y"), (Some(1L: java.lang.Long), "p"))
      .toDF("id", "s")
    val d = TransactionalLake.diffSnapshots(a, b, Seq("id")).collect()
    assert(d.length == 1)
    assert(d.head.isNullAt(d.head.fieldIndex("id")))
    assert(d.head.getAs[String]("change_type") == "changed")
    // and unchanged null-keyed rows are dropped entirely
    assert(TransactionalLake.diffSnapshots(a, a, Seq("id")).isEmpty)
  }

  test("diffSnapshots refuses mismatched schemas and key-only frames") {
    val a = Seq((1L, "a")).toDF("id", "s")
    val b = Seq((1L, 2.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      TransactionalLake.diffSnapshots(a, b, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      TransactionalLake.diffSnapshots(a.select("id"), a.select("id"), Seq("id"))
    }
  }

  test("readMergedAsOf resolves latest-wins at the cut and refuses below horizon") {
    val root = tmpDir("sdiff_asof")
    val none = Seq.empty[Long].toDF("id")
    TransactionalLake.mergeCommit(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), none, root, 0L, Seq("id"))
    TransactionalLake.mergeCommit(
      Seq((1L, 11.0)).toDF("id", "v"), Seq(2L).toDF("id"), root, 1L, Seq("id"))
    val v0 = TransactionalLake.readMergedAsOf(spark, root, Seq("id"), 0L)
      .as[(Long, Double)].collect().toMap
    val v1 = TransactionalLake.readMergedAsOf(spark, root, Seq("id"), 1L)
      .as[(Long, Double)].collect().toMap
    assert(v0 === Map(1L -> 10.0, 2L -> 20.0))
    assert(v1 === Map(1L -> 11.0))
    // compaction resolves history at/below the horizon → as-of below it refuses
    assert(TransactionalLake.compactMerged(spark, root, upTo = 0L, Seq("id")) >= 0)
    intercept[IllegalArgumentException] {
      TransactionalLake.readMergedAsOf(spark, root, Seq("id"), -1L)
    }
  }

  test("q_dq_audit: clean tables pass every constraint; counts line up") {
    val rep = graft.queries.Analytics.dqAudit(spark, sf0001)
      .as[(String, Long, Long, Boolean)].collect()
    assert(rep.length === 6)
    assert(rep.forall(_._4), s"violations on clean data: ${rep.filterNot(_._4).toSeq}")
    val liN = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(rep.filter(_._1.startsWith("not_null")).head._2 === liN)
  }

  test("q_scd2_intervals: intervals tile each user's timeline") {
    val iv = graft.queries.Analytics.scd2Intervals(spark, sf0001)
    val perUser = iv.groupBy("user_id").agg(
      sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"),
      sum(when(col("valid_to").isNotNull &&
        col("valid_to") <= col("valid_from"), 1L).otherwise(0L)).as("n_bad"))
      .as[(Long, Long, Long)].collect()
    assert(perUser.nonEmpty)
    assert(perUser.forall(_._2 == 1L), "exactly one open interval per user")
    assert(perUser.forall(_._3 == 0L), "valid_to must be after valid_from")
    // adjacent versions never share an event_type (runs are maximal)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val repeats = iv.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev") === col("event_type")).count()
    assert(repeats === 0L)
    // n_events over intervals == filtered event count
    val total = iv.agg(sum("n_events")).as[Long].head()
    val expected = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("user_id") <= 200).count()
    assert(total === expected)
  }
}
