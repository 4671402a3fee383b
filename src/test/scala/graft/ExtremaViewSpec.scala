package graft

import graft.sources.{KeyedView => K, TransactionalLake => T}
import org.apache.spark.sql.functions._

/** Min/max-maintaining keyed view ([[graft.sources.KeyedView
  * .refreshExtrema]]): convergence to the resolved-merge extrema under
  * upserts/tombstones/group moves, the K-extreme buffer's admission
  * filter (incoming values past the coverage ceil must NOT be trusted
  * as extremes), exhaustion-triggered group recompute + buffer refill,
  * and repeated min-deletion cycles that shrink the buffer to empty and
  * back. */
class ExtremaViewSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Long*) =
    ids.toDF("k").select(col("k"),
      concat(lit("g"), col("k") % 2).as("grp"),
      col("k").cast("double").as("value"))

  private def oneGroup(ids: Long*) =
    ids.toDF("k").select(col("k"), lit("g").as("grp"),
      col("k").cast("double").as("value"))

  private def noDeletes = rows().select("k")

  private def refresh(lake: String, view: String, bufK: Int = 8): Long =
    K.refreshExtrema(spark, lake, view, "k", "grp", "value", bufferK = bufK)

  private def stateOf(view: String): Map[String, (Long, Double, Double)] =
    K.readExtrema(spark, view).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap

  /** extrema recomputed from the lake's resolved merge view. */
  private def oneShot(lake: String): Map[String, (Long, Double, Double)] =
    T.readMerged(spark, lake, Seq("k"))
      .groupBy("grp").agg(count(lit(1)).cast("long").as("cnt"),
        min("value").as("mn"), max("value").as("mx"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  test("incremental extrema track the resolved merge state through " +
    "upserts, tombstones, and group moves") {
    val lake = tmpDir("ex_lake"); val view = tmpDir("ex_view")
    T.mergeCommit(rows(1L to 30L: _*), noDeletes, lake, 0L, Seq("k"))
    assert(refresh(lake, view) == 0L)
    assert(stateOf(view) == oneShot(lake))
    // value upserts in both directions (k=2 -> 200 raises g0's max;
    // k=29 -> 0.5 lowers g1's min) + a tombstone of g1's old min (k=1)
    T.mergeCommit(
      rows(2L).withColumn("value", lit(200.0))
        .unionByName(rows(29L).withColumn("value", lit(0.5))),
      Seq(1L).toDF("k"), lake, 1L, Seq("k"))
    assert(refresh(lake, view) == 1L)
    val s1 = stateOf(view)
    assert(s1 == oneShot(lake))
    assert(s1("g0") == ((15L, 4.0, 200.0)))
    assert(s1("g1") == ((14L, 0.5, 27.0)))
    // group MOVE: the max-holder k=2 leaves for gX; g0's max falls back
    T.mergeCommit(rows(2L).withColumn("grp", lit("gX"))
      .withColumn("value", lit(200.0)), noDeletes, lake, 2L, Seq("k"))
    assert(refresh(lake, view) == 2L)
    val s2 = stateOf(view)
    assert(s2 == oneShot(lake))
    assert(s2("gX") == ((1L, 200.0, 200.0)))
    assert(s2("g0")._3 == 30.0)
    // no-op refresh: head unchanged
    assert(refresh(lake, view) == 2L)
    assert(stateOf(view) == s2)
  }

  test("the admission filter rejects values past the ceil, and an " +
    "exhausted buffer recomputes from the key index") {
    val lake = tmpDir("ex_adm_lake"); val view = tmpDir("ex_adm_view")
    // one group, values 1..20; K=8 buffers: lobuf 1..8 (ceil 9)
    T.mergeCommit(oneGroup(1L to 20L: _*), noDeletes, lake, 0L, Seq("k"))
    assert(refresh(lake, view) == 0L)
    // delete 1..7 (surviving buffered min: 8) and upsert k=100 with
    // value 100 — past the ceil, so it must NOT enter the lo-buffer
    T.mergeCommit(oneGroup(100L).withColumn("value", lit(100.0)),
      (1L to 7L).toDF("k"), lake, 1L, Seq("k"))
    assert(refresh(lake, view) == 1L)
    assert(stateOf(view)("g") == ((14L, 8.0, 100.0)))
    // now delete the last buffered entry (8): the lo-buffer is empty and
    // the unbuffered 9..20 are cheaper than the rejected 100 — only the
    // key-index recompute can answer 9 (a buffer that had admitted 100
    // would report it); the refill restores full width
    T.mergeCommit(oneGroup().limit(0), Seq(8L).toDF("k"), lake, 2L, Seq("k"))
    assert(refresh(lake, view) == 2L)
    assert(stateOf(view)("g") == ((13L, 9.0, 100.0)))
    val raw = K.read(spark, view).filter(col("g") === "g")
      .select(size(col("lobuf")), size(col("hibuf"))).head()
    assert(raw.getInt(0) == 8 && raw.getInt(1) == 8)
    assert(stateOf(view) == oneShot(lake))
  }

  test("repeated min/max deletions shrink the buffer to empty and " +
    "recover through recompute, staying exact throughout") {
    val lake = tmpDir("ex_cycle_lake"); val view = tmpDir("ex_cycle_view")
    T.mergeCommit(oneGroup(1L to 15L: _*), noDeletes, lake, 0L, Seq("k"))
    assert(refresh(lake, view, bufK = 3) == 0L)
    // alternate deleting the current min and the current max: with K=3
    // the buffers exhaust every few epochs and must refill exactly
    var epoch = 0L
    for (step <- 1 to 10) {
      val live = T.readMerged(spark, lake, Seq("k"))
        .select("k", "value").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val victim =
        if (step % 2 == 1) live.minBy(_._2)._1 else live.maxBy(_._2)._1
      epoch += 1
      T.mergeCommit(oneGroup().limit(0), Seq(victim).toDF("k"), lake,
        epoch, Seq("k"))
      assert(refresh(lake, view, bufK = 3) == epoch)
      assert(stateOf(view) == oneShot(lake), s"diverged at step $step")
    }
    // 15 - 10 deletes = 5 live rows: 6..10 survive the alternation
    assert(stateOf(view)("g") == ((5L, 6.0, 10.0)))
  }
}
