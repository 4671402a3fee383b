package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsOf picks the latest right row at or before the left time") {
    val left = Seq((1L, "k", 100L), (2L, "k", 205L), (3L, "k", 50L), (4L, "z", 100L))
      .toDF("lid", "key", "t")
    val right = Seq((10L, "k", 100L), (11L, "k", 200L), (12L, "k", 300L))
      .toDF("rid", "key", "t")
    val out = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t", Seq("rid"), "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(10L)) // equal time matches
    assert(out(2L).contains(11L)) // latest before 205
    assert(out(3L).isEmpty)       // nothing before 50
    assert(out(4L).isEmpty)       // different key
  }

  test("equal-time right duplicates resolve to the greatest tiebreak") {
    val left = Seq((1L, "k", 100L)).toDF("lid", "key", "t")
    val right = Seq((10L, "k", 100L), (99L, "k", 100L), (5L, "k", 100L))
      .toDF("rid", "key", "t")
    val out = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t", Seq("rid"), "rid")
      .select("rid").as[Long].head()
    assert(out == 99L)
  }
}
