package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The continuously-measurable form of the multi-probe claim: at equal
  * scanned budget, query-directed probing recalls MORE of the exact
  * top-k than a proportional random scan would (whose expected recall
  * equals the scanned fraction). Uses the measured candidate counts, not
  * the analytic bucket estimate. */
class AnnRecallSpec extends SparkSpec {

  test("query-directed LSH probing beats proportional scan at equal measured budget") {
    val sf001 = "/root/testdata/sf0.01"
    val e = Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = e.filter(col("vec_id") < 20)
    val k = 10
    val nCorpus = e.count()
    val allPairs = (probes.count() * (nCorpus - 1)).toDouble
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding", k)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).map { case (p, r) => p -> r.map(_.getLong(1)).toSet }

    Seq(2, 8, 16).foreach { nProbes =>
      val sink = tmpDir(s"ann_lsh_$nProbes")
      val got = Similarity.lshTopK(e, probes, "vec_id", "embedding", k,
        nProbes = nProbes, candidateSink = Some(sink))
        .select(col("probe_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).map { case (p, r) => p -> r.map(_.getLong(1)).toSet }
      val recall = exact.map { case (p, truth) =>
        got.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
      val scanned = spark.read.parquet(sink).count() / allPairs
      assert(recall >= scanned,
        s"nProbes=$nProbes: directed recall $recall must beat the " +
          s"proportional-scan line at measured budget $scanned")
    }
  }
}
