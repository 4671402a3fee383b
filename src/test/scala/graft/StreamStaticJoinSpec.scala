package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static join: enriching a stream against a static dimension
  * (the lookup-table pattern; the static side re-plans per micro-batch). */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  test("stream enriched against a static dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "gold"), (1L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Double)]
    val joined = in.toDF().toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_out").start()
    try {
      in.addData((0L, 1.0), (1L, 2.0), (7L, 3.0))
      q.processAllAvailable()
      val out = spark.table("ss_out")
        .select($"user_id", $"tier").as[(Long, Option[String])]
        .collect().toMap
      assert(out(0L).contains("gold") && out(1L).contains("silver") && out(7L).isEmpty)
    } finally q.stop()
  }
}
