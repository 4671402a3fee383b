package graft

import graft.functions.{TextFunctions => TF}
import graft.plans.MinHashAgg
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("group signature estimates union-set jaccard within sketch error") {
    val docs = Tables.load(spark, sf0001, "documents")
      .withColumn("grp", (col("doc_id") % 2).cast("int"))
    val sigs = docs
      .select(col("grp"), TF.shingleSet(col("text"), 3).as("sh"))
      .groupBy("grp").agg(MinHashAgg.minhashAgg(col("sh"), 128).as("sig"))
      .orderBy("grp").collect()
    val est = {
      val a = sigs(0).getSeq[Long](1)
      val b = sigs(1).getSeq[Long](1)
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    }
    // exact jaccard of the two groups' union shingle sets
    val sets = docs.select(col("grp"), explode(TF.shingleSet(col("text"), 3)).as("s"))
      .distinct().as[(Int, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = (sets(0) & sets(1)).size.toDouble / (sets(0) | sets(1)).size
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
  }

  test("aggregate is mergeable: repartitioned input gives identical signature") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select(lit(1).as("g"), TF.shingleSet(col("text"), 3).as("sh"))
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.groupBy("g").agg(MinHashAgg.minhashAgg(col("sh"), 64).as("sig"))
        .select("sig").as[Seq[Long]].head()
    assert(sig(docs.repartition(1)) == sig(docs.repartition(13)))
  }
}
