package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import graft.plans.SketchExpressions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the dedup hot path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name ($n rows)")
    }

    time("warmup count")(docs.count())
    val sets = docs.select(col("doc_id"), TF.shingleSet(col("text"), 3).as("sh"))
      .withColumn("sh_n", size(col("sh"))).filter(col("sh_n") > 0)
    time("shingleSets")(sets.count())
    time("minhash sigs")(sets.select(col("doc_id"),
      SketchExpressions.minhashSignature(col("sh"), 64).as("sig")).count())
    time("simhash sigs")(sets.select(col("doc_id"),
      SketchExpressions.simhash64(col("sh")).as("sig")).count())
    val postings = sets.select(col("doc_id").as("id"), col("sh_n"), explode(col("sh")).as("shingle"))
    time("postings")(postings.count())
    val dfreq = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val ranked = postings.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))))
    val prefix = ranked.filter(col("rn") <= col("sh_n") - ceil(lit(0.8) * col("sh_n")).cast("int") + 1)
    time("prefix postings")(prefix.count())
    val l = prefix.select(col("id").as("id_a"), col("shingle"))
    val r = prefix.select(col("id").as("id_b"), col("shingle"))
    val cand = l.join(r, "shingle").filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("candidates")(cand.count())
    time("full ngram")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("full minhash")(Dedup.minhashNearDupPairs(docs, "doc_id", "text").count())
    time("full simhash")(Dedup.simhashNearDupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}

/** Lake-roundtrip stage profiler. */
object ProfileLake {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_CODEC", "zstd"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val x = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
      x
    }
    val root = "/root/repo/target/tmp/lakeprof"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val events = Tables.load(spark, sfDir, "events")
    val tenantCol = concat(lit("t"), (col("user_id") % 3).cast("string"))
    val enriched = graft.ingest.Ingest.derivePartitions(
      graft.ingest.Ingest.enrich(events, tenantCol, unix_timestamp(col("ts"))))
      .select(col("event_id"), col("event_type"), col("value"),
        col("tenant"), col("year"), col("month"), col("day"), col("hour"))
    time("writeValid")(graft.sources.Lake.writeValid(enriched, root))
    time("registerExternal")(graft.sources.Lake.registerExternal(spark, "lp_events", s"$root/data"))
    time("query")(spark.table("lp_events").filter(col("tenant") === "t1").count())
    time("query2")(spark.table("lp_events").filter(col("tenant") === "t1").count())
    spark.stop()
  }
}

/** Similarity stage profiler. */
object ProfileSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name"); x
    }
    val embs = Tables.load(spark, sfDir, "embeddings")
    time("warmup")(embs.count())
    import graft.functions.{VectorFunctions => VF}
    val c = embs.select(col("vec_id").as("c_id"), VF.toDouble(col("embedding")).as("c_e"))
      .withColumn("c_nrm", VF.norm(col("c_e")))
    time("corpus normed")(c.count())
    val p = embs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("p_id"), VF.toDouble(col("embedding")).as("p_e"))
      .withColumn("p_nrm", VF.norm(col("p_e")))
    val scored = c.crossJoin(broadcast(p)).filter(col("p_id") =!= col("c_id"))
      .withColumn("cosine", VF.cosineWithNorms(col("p_e"), col("c_e"), col("p_nrm"), col("c_nrm")))
    time("scored")(scored.count())
    time("full topk")(graft.operators.Similarity.bruteForceTopK(embs,
      embs.filter(col("vec_id") < 10), "vec_id", "embedding", 5).count())
    spark.stop()
  }
}
