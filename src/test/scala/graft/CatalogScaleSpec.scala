package graft

import graft.sources.Lake

/** Metastore-scale evidence for the incremental crawler analog: a
  * long-lived lake accumulates O(1000s) of tenant×hour partitions, and
  * the per-micro-batch registration path must stay O(batch) — ONE
  * metastore statement per batch, cost independent of how many
  * partitions the table already holds (a recoverPartitions crawl is
  * O(table) and unusable at micro-batch cadence). Local catalogs
  * (in-memory here, Derby) serialize DDL; the deployment note in
  * DEPLOYMENT.md covers pointing spark.sql.catalogImplementation=hive at
  * a shared metastore, where the same one-statement-per-batch contract
  * is what bounds metastore RPC load. */
class CatalogScaleSpec extends SparkSpec {
  import spark.implicits._

  test("registerPartitions: 1000 partitions, one statement per batch, flat per-batch cost") {
    val root = tmpDir("cat_scale")
    val tbl = "cat_scale_events"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val tuples = for { t <- 0 until 50; h <- 0 until 20 } yield
      Map("tenant" -> s"t$t", "year" -> "2024", "month" -> "01",
        "day" -> "01", "hour" -> f"$h%02d")
    // one partitioned write lays down all 1000 directories up front; the
    // test then registers them the way the sink does — in arrival batches
    tuples.zipWithIndex.map { case (m, i) =>
      (i.toLong, m("tenant"), m("year"), m("month"), m("day"), m("hour"))
    }.toDF("event_id", "tenant", "year", "month", "day", "hour")
      .repartition(8).write.mode("overwrite")
      .partitionBy("tenant", "year", "month", "day", "hour")
      .parquet(s"$root/data")

    val batches = tuples.grouped(20).toSeq // 50 micro-batches of 20
    val times = batches.map { b =>
      val t0 = System.nanoTime()
      val stmts = Lake.registerPartitions(spark, tbl, s"$root/data", b)
      assert(stmts == 1, "exactly one metastore statement per non-empty batch")
      (System.nanoTime() - t0) / 1e9
    }
    assert(spark.sql(s"SHOW PARTITIONS $tbl").count() == 1000)
    // registration cost must not scale with TABLE size: compare early
    // batches (small table) against the last ones (1000-partition table).
    // Generous bound — this guards against O(table) crawls sneaking in,
    // not scheduler jitter.
    val head = times.slice(1, 6).sum / 5 // batch 0 pays table creation
    val tail = times.takeRight(5).sum / 5
    assert(tail < head * 10 + 0.5,
      s"per-batch registration cost grew with table size: head=$head s, tail=$tail s")
    // the registered table serves data through partition pruning
    assert(spark.table(tbl).where("tenant = 't7' AND hour = '03'").count() == 1)
    // an empty / all-null batch issues NO statement
    assert(Lake.registerPartitions(spark, tbl, s"$root/data", Seq.empty) == 0)
    assert(Lake.registerPartitions(spark, tbl, s"$root/data",
      Seq(Map("tenant" -> null, "year" -> "2024", "month" -> "01",
        "day" -> "01", "hour" -> "00"))) == 0)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
