package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB lever for selective
  * shuffle joins: when one join side carries a selective predicate,
  * Catalyst builds a bloom filter over its join keys at runtime and
  * injects a `might_contain` pre-filter on the OTHER side's scan, so
  * most probe rows die at the scan instead of riding the shuffle.
  * (Broadcast joins don't need it; this is for the SMJ/SHJ case where
  * both sides shuffle.) The spec pins that the optimizer actually
  * injects the filter for our join shapes and that results are
  * unchanged — the knob Spark exposes, demonstrated on our tables.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom filter on the fact scan (SMJ path)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = Tables.load(spark, sf0001, "lineitem")
      val sup = Tables.load(spark, sf0001, "supplier").filter(col("s_acctbal") > 5000)
      val joined = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(sup("s_suppkey")).agg(count(lit(1)).as("cnt"))
      val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom runtime filter in:\n${plan.take(3000)}")

      // semantics unchanged vs the no-runtime-filter plan
      val expect = withConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        li.join(sup, li("l_suppkey") === sup("s_suppkey"))
          .groupBy(sup("s_suppkey")).agg(count(lit(1)).as("cnt"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(got == expect)
    }
  }

  test("the bloom filter reduces probe-side rows entering the shuffle") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = Tables.load(spark, sf0001, "lineitem")
      // selective creation side on a NON-key column (a key predicate like
      // s_suppkey = 1 would be constant-propagated into the probe scan
      // and both plans would prune identically): keeps 1 supplier of 10
      val sup = Tables.load(spark, sf0001, "supplier").filter(col("s_acctbal") > 6000)

      // might_contain lands as a post-scan FilterExec over the lineitem
      // scan — its output is what rides the shuffle, so that's the metric
      // AQE wraps stages: descend through AdaptiveSparkPlanExec/QueryStageExec
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allNodes(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allNodes(q.plan)
          case n => Seq(n)
        }

      def probeFilterRows(bloom: Boolean): Long = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> bloom.toString) {
        val j = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        j.collect()
        allNodes(j.queryExecution.executedPlan).collect {
          case f: org.apache.spark.sql.execution.FilterExec
              if f.output.exists(_.name == "l_suppkey") =>
            f.metrics("numOutputRows").value
        }.sum
      }

      val withBloom = probeFilterRows(bloom = true)
      val without = probeFilterRows(bloom = false)
      info(s"probe rows entering shuffle: bloom=$withBloom off=$without")
      assert(withBloom > 0L, "join must produce rows")
      assert(withBloom * 2 < without,
        s"bloom filter should cut shuffled probe rows at least 2x ($withBloom vs $without)")
    }
  }
}
