package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class SkewLakeSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed keys") {
    // 90% of rows on one hot key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = Skew.saltedInnerJoin(big, small, "k").groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val p = plain.orderBy("k").collect().toSeq
    val q = salted.orderBy("k").collect().toSeq
    assert(p == q)
  }

  test("AQE splits a skewed shuffle-join partition at runtime (the non-manual path)") {
    // The complementary mechanism to Skew.saltedInnerJoin: for plain
    // shuffle joins AQE detects an oversized partition AFTER the map
    // stage and splits it across tasks — no code change, correct
    // results. Plant one hot key carrying wide payloads, force a
    // sort-merge join, and assert the final adaptive plan actually
    // took the skew-split path (the SMJ is marked skew=true).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so the fixture-scale hot partition counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 512
      val big = (1 to 20000)
        .map(i => (if (i % 100 == 0) i.toLong else 7L, s"$pad$i"))
        .toDF("k", "payload")
      val small = (100 to 20000 by 100).map(_.toLong).map((_, "m")).toSeq
        .prepended((7L, "hot")).toDF("k", "name")
      // keep the wide payload flowing through the join — column pruning
      // would otherwise shrink the shuffled bytes below any threshold
      val joined = big.join(small, Seq("k")).select("k", "payload", "name")
      // execute THIS dataset (count() would build its own query execution
      // and leave `joined`'s adaptive plan un-finalized)
      assert(joined.collect().length == 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not trigger:\n${finalPlan.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("salted two-phase aggregation equals direct groupBy (exact decimals)") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val direct = li.groupBy($"l_returnflag".as("k"))
      .agg(sum($"l_quantity".cast(DecimalType(10, 2))).as("sum_value"),
        count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedSumCount(
      li.withColumnRenamed("l_returnflag", "k"), "k",
      $"l_quantity".cast(DecimalType(10, 2)))
      .orderBy("k").collect().toSeq
    assert(direct.map(r => (r.getString(0), r.getDecimal(1).stripTrailingZeros, r.getLong(2))) ==
      salted.map(r => (r.getString(0), r.getDecimal(1).stripTrailingZeros, r.getLong(2))))
  }

  private def fileCount(p: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
    var n = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  private def withLakeCols(df: org.apache.spark.sql.DataFrame, tenant: String) =
    df.withColumn("tenant", lit(tenant)).withColumn("year", lit("2024"))
      .withColumn("month", lit("01")).withColumn("day", lit("01"))
      .withColumn("hour", lit("00"))

  test("compaction is partition-scoped, in-place, and content-preserving") {
    val root = tmpDir("compact")
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity").limit(1000)
    // hot partition t0 gets 3 small appends; t1 gets 1 — t1 must be untouched
    (1 to 3).foreach(_ => graft.sources.Lake.writeValid(withLakeCols(li, "t0"), root))
    graft.sources.Lake.writeValid(withLakeCols(li, "t1"), root)
    graft.sources.Lake.registerExternal(spark, "compact_tbl", s"$root/data")
    val t0Dir = s"$root/data/tenant=t0"
    val t1Dir = s"$root/data/tenant=t1"
    val (t0Before, t1Before) = (fileCount(t0Dir), fileCount(t1Dir))
    assert(t0Before > 1, "precondition: hot partition has many small files")
    val before = spark.table("compact_tbl").collect().toSeq
      .map(_.toString).sorted
    // the compaction read itself must partition-prune
    val pruned = spark.table("compact_tbl").where("tenant = 't0'")
    assert(graft.operators.TenantQueries.prunesOnTenant(pruned))
    graft.sources.Lake.compact(spark, "compact_tbl", "tenant = 't0'")
    assert(fileCount(t0Dir) < t0Before, "hot partition must have fewer files")
    assert(fileCount(t1Dir) == t1Before, "untouched partition must keep its files")
    val after = spark.table("compact_tbl").collect().toSeq
      .map(_.toString).sorted
    assert(before == after, "compaction must be content-preserving")
  }

  test("compact rejects row-level predicates and no-ops on empty matches") {
    val root = tmpDir("compact_guard")
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity").limit(100)
    graft.sources.Lake.writeValid(withLakeCols(li, "t0"), root)
    graft.sources.Lake.registerExternal(spark, "compact_guard_tbl", s"$root/data")
    // a row-level predicate would DELETE non-matching rows of the
    // touched partitions under dynamic overwrite — must be rejected
    intercept[IllegalArgumentException] {
      graft.sources.Lake.compact(spark, "compact_guard_tbl",
        "tenant = 't0' AND l_quantity > 5")
    }
    // attribute-free but row-level (non-deterministic) predicates too
    intercept[IllegalArgumentException] {
      graft.sources.Lake.compact(spark, "compact_guard_tbl", "rand() < 0.5")
    }
    assert(spark.table("compact_guard_tbl").count() == 100, "table untouched")
    // empty match → no-op, not a crash
    graft.sources.Lake.compact(spark, "compact_guard_tbl", "tenant = 'absent'")
    assert(spark.table("compact_guard_tbl").count() == 100)
  }

  test("salted writer spreads one hot partition across multiple writers") {
    val root = tmpDir("salted")
    val hot = withLakeCols(
      Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity").limit(2000), "t0")
    graft.sources.Lake.writeValid(hot, root, saltFiles = 4)
    val files = fileCount(s"$root/data/tenant=t0")
    assert(files > 1, "hot partition must be written by more than one task")
    assert(files <= 4, "salt must bound the file count")
    assert(spark.read.parquet(s"$root/data").count() == 2000)
  }
}
