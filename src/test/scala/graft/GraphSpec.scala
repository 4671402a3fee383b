package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank: fixed points on known graphs, mass conservation, importance
  * ordering, bit-determinism across partitionings, and the zero-residual
  * block-hygiene contract shared with connectedComponents. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("src", "dst")

  private def ranks(e: org.apache.spark.sql.DataFrame,
                    iters: Int = 5): Map[Long, Double] =
    Graph.pageRank(e, "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle is the symmetric fixed point") {
    val r = ranks(edges(1L -> 2L, 2L -> 1L), iters = 10)
    assert(r == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("star graph: the hub outranks the spokes, mass is conserved") {
    // 3 spokes -> hub, hub -> all spokes (no dangling nodes)
    val e = edges(1L -> 99L, 2L -> 99L, 3L -> 99L,
      99L -> 1L, 99L -> 2L, 99L -> 3L)
    val r = ranks(e, iters = 20)
    assert(r(99L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L))
    // no dangling nodes -> total mass stays 1 (up to the 12-dp rounding)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("rank vector is bit-identical across shuffle partitionings") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(60).select(col("vec_id").as("src"),
        (col("vec_id") * 7 % 60).as("dst"))
      .filter(col("src") =!= col("dst"))
    val a = ranks(e)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "11")
      assert(ranks(e) == a) // exact equality, not tolerance
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("pageRank holds zero residual storage after returning") {
    val out = Graph.pageRank(edges(1L -> 2L, 2L -> 3L, 3L -> 1L), "src", "dst")
    out.count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked blocks: ${spark.sparkContext.getPersistentRDDs.keys}")
  }
}
