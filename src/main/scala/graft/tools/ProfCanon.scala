package graft.tools

import graft.functions.{TextFunctions => TF}
import graft.operators.{Blocks, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for canonicalize (not part of the library). */
object ProfCanon {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft-bench-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    docs.limit(1).collect()
    val k = 3; val threshold = 0.8
    time("shingleSets") {
      docs.select(col("doc_id"), TF.shingleSet(col("text"), k).as("sh"))
        .withColumn("sh_n", size(col("sh"))).filter(col("sh_n") > 0).count()
    }
    val sets = docs.select(col("doc_id"), TF.shingleSet(col("text"), k).as("sh"))
      .withColumn("sh_n", size(col("sh"))).filter(col("sh_n") > 0)
    val postings = sets.select(col("doc_id").as("id"), col("sh_n"),
      explode(col("sh")).as("shingle"))
    time("postings+dfreq") {
      postings.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100000).count()
    }
    val dfreq = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 100000)
    val ranked = postings.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))))
    val prefixLen = col("sh_n") - ceil(lit(threshold) * col("sh_n")).cast("int") + 1
    val prefix = ranked.filter(col("rn") <= prefixLen)
    time("prefix(rank+filter)") { prefix.count() }
    val l = prefix.select(col("id").as("id_a"), col("shingle"))
    val r = prefix.select(col("id").as("id_b"), col("shingle"))
    val candidates = l.join(r, "shingle")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates") { candidates.count() }
    time("verify(full pairs)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", k, threshold).count()
    }
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k, threshold).persist()
    pairs.count()
    val touched = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id"))).distinct()
    time("cc") {
      Dedup.connectedComponents(pairs, touched, "id").count()
    }
    time("canonicalize(e2e)") {
      Dedup.canonicalize(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
