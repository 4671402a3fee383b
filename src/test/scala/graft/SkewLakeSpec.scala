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

  test("compaction preserves rows and reduces file count") {
    val root = tmpDir("compact")
    val li = Tables.load(spark, sf0001, "lineitem").limit(1000)
      .withColumn("tenant", lit("t0")).withColumn("year", lit("2024"))
      .withColumn("month", lit("01")).withColumn("day", lit("01"))
      .withColumn("hour", lit("00"))
    // three small appends → many files in one partition
    (1 to 3).foreach(_ => graft.sources.Lake.writeValid(li, root))
    val dataPath = s"$root/data"
    def fileCount(p: String): Int = {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = fileCount(dataPath)
    graft.sources.Lake.compact(spark, dataPath)
    val compacted = s"${dataPath}_compacted"
    assert(spark.read.parquet(compacted).count() == 3000)
    assert(fileCount(compacted) < before)
  }
}
