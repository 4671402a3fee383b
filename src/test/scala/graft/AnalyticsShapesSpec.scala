package graft

import graft.queries.Analytics
import org.apache.spark.sql.functions._

/** Shape properties of the time-series/behavioral analytics queries the
  * oracle gate can't articulate: density of the gap-fill spine, funnel
  * monotonicity, cohort-triangle invariants. */
class AnalyticsShapesSpec extends SparkSpec {

  test("gap-fill emits a dense hour spine: |types| x |hours|, no holes") {
    val out = Analytics.gapFillHourly(spark, sf0001).cache()
    try {
      val types = out.select("event_type").distinct().count()
      val hours = out.agg(max("hour_idx").cast("long") -
        min("hour_idx").cast("long") + 1L).head().getLong(0)
      assert(out.count() == types * hours)
      // zero-filled rows exist exactly where raw data was absent, and the
      // forward fill never yields 0 (it carries the last OBSERVED count)
      val zeroRows = out.filter(col("n") === 0)
      assert(zeroRows.count() > 0) // the fixture does have sparse hours
      assert(zeroRows.filter(col("n_ffill") === 0).count() == 0)
    } finally out.unpersist()
  }

  test("funnel stages are monotone non-increasing") {
    val stages = Analytics.funnel(spark, sf0001)
      .orderBy("stage").collect().map(_.getLong(2))
    assert(stages.length == 3)
    assert(stages(0) >= stages(1) && stages(1) >= stages(2))
    assert(stages(0) > 0)
  }

  test("cohort retention: offset-0 cell equals the cohort's size") {
    val r = Analytics.cohortRetention(spark, sf0001).cache()
    try {
      // every user appears in their cohort's offset-0 cell, so summing
      // offset-0 over cohorts equals the distinct-user count
      val users = spark.read.parquet(s"$sf0001/events.parquet")
        .select("user_id").distinct().count()
      val offset0 = r.filter(col("week_offset") === 0)
        .agg(sum("n_users")).head().getLong(0)
      assert(offset0 == users)
      // offsets are non-negative by construction
      assert(r.filter(col("week_offset") < 0).count() == 0)
    } finally r.unpersist()
  }
}
