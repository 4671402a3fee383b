package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive non-equi join") {
    val pts = (0L until 500L).map(i => (i, i * 37 % 1000)).toDF("pid", "t")
    val ivs = Seq((1L, 0L, 100L), (2L, 90L, 95L), (3L, 500L, 1000L), (4L, 999L, 1000L))
      .toDF("iid", "s", "e")
    val naive = pts.join(ivs, $"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val binned = RangeJoin.pointInInterval(pts, ivs, $"t", $"s", $"e", binSeconds = 64)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("binned range join handles negative (pre-epoch) times") {
    val pts = Seq((1L, -100L), (2L, -5L), (3L, 5L)).toDF("pid", "t")
    val ivs = Seq((1L, -150L, -50L), (2L, -10L, 10L)).toDF("iid", "s", "e")
    val naive = pts.join(ivs, $"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val binned = RangeJoin.pointInInterval(pts, ivs, $"t", $"s", $"e", binSeconds = 64)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive && naive.nonEmpty)
  }
}
