package graft

import graft.operators.EntityResolution
import org.apache.spark.sql.functions._

/** Cross-table fuzzy join: blocked form ≡ brute force (the blocking
  * lemma never loses a pair), exact-match and near-miss behavior,
  * sub-k strings, and asymmetric table roles. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def t(rows: (Long, String)*) = rows.toDF("id", "name")

  private def pairs(l: org.apache.spark.sql.DataFrame,
                    r: org.apache.spark.sql.DataFrame, th: Double) =
    EntityResolution.fuzzyJoin(l, "id", "name", r, "id", "name",
      k = 3, threshold = th)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  test("matches identical and near-identical names across tables, not others") {
    val left = t(1L -> "acme corporation", 2L -> "globex industries",
      3L -> "zz")
    val right = t(10L -> "acme corporation", 11L -> "acme corp",
      12L -> "initech llc", 13L -> "ab")
    val m = pairs(left, right, 0.5)
    assert(m.contains((1L, 10L))) // identical -> J = 1
    assert(m.contains((1L, 11L))) // prefix-sharing -> high J
    assert(!m.exists(_._2 == 12L)) // unrelated never matches
    // sub-k strings have no grams and never pair (both directions)
    assert(!m.exists(p => p._1 == 3L || p._2 == 13L))
  }

  test("blocked join equals brute force on the fixture tables") {
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val supp = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select(col("s_suppkey").as("id"), col("s_name").as("name"))
    val blocked = pairs(cust, supp, 0.25)
    // brute force: cross join + exact jaccard, no blocking
    val cg = cust.select(col("id").as("id_a"),
      EntityResolution.charGrams(col("name"), 3).as("g_a"))
    val sg = supp.select(col("id").as("id_b"),
      EntityResolution.charGrams(col("name"), 3).as("g_b"))
    val inter = size(array_intersect(col("g_a"), col("g_b")))
    val brute = cg.crossJoin(sg)
      .withColumn("j", inter.cast("double") /
        (size(col("g_a")) + size(col("g_b")) - inter).cast("double"))
      .filter(col("j") >= 0.25)
      .select("id_a", "id_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(blocked == brute)
    assert(blocked.nonEmpty)
  }

  test("blocking budget: candidate pairs stay far under all-pairs at gate scale") {
    // Exact blocking at threshold 0.32 IMPROVES with scale: grams grow
    // relatively rarer, so the candidate fraction falls — measured
    // 100% of all-pairs at sf0.001 (150×10: any name pair shares some
    // rare digit trigram; no sub-quadratic exact answer exists there),
    // 53% at sf0.01, 15% at sf0.1. This pins the sf0.01 point: a
    // regression of the prefix/stop-gram machinery back toward
    // all-pairs trips it, while the bench pins the sf0.1 cost.
    val dir = "/root/testdata/sf0.01"
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("id"), col("s_name").as("name"))
    val sink = tmpDir("er_cands")
    val matches = EntityResolution.fuzzyJoin(cust, "id", "name",
      supp, "id", "name", k = 3, threshold = 0.32,
      candidateSink = Some(sink)).count()
    val candidates = spark.read.parquet(sink).count()
    val allPairs = cust.count() * supp.count()
    info(s"candidates=$candidates of allPairs=$allPairs (matches=$matches)")
    assert(candidates < (allPairs * 6) / 10,
      s"blocking produced $candidates of $allPairs possible pairs")
    assert(matches > 0 && matches <= candidates)
  }

  test("dense budget refuses in-plan, never runs a silent quadratic") {
    // records made entirely of one stop-gram: every row is dense at a
    // low threshold, so the dense cross must refuse past the budget —
    // the refusal is a raise_error INSIDE the plan (no driver-side
    // count job), so it surfaces when the query runs
    val left = t(1L -> "aaaa", 2L -> "aaaa", 3L -> "aaaa")
    val right = t(10L -> "aaaa", 11L -> "aaaa")
    val e = intercept[Exception] {
      EntityResolution.fuzzyJoin(left, "id", "name", right, "id", "name",
        k = 3, threshold = 0.5, stopGramFraction = 0.1,
        maxDensePairs = 1L).count()
    }
    assert(e.getMessage.contains("maxDensePairs"))
    // same corpus inside the budget: the dense cross finds every pair
    val ok = EntityResolution.fuzzyJoin(left, "id", "name", right, "id",
      "name", k = 3, threshold = 0.5, stopGramFraction = 0.1,
      maxDensePairs = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(ok === Set(1L -> 10L, 1L -> 11L, 2L -> 10L, 2L -> 11L,
      3L -> 10L, 3L -> 11L))
  }

  test("threshold 1.0 keeps only exact gram-set matches") {
    val m = pairs(t(1L -> "alpha beta"), t(2L -> "alpha beta", 3L -> "alpha bet"), 1.0)
    assert(m == Set((1L, 2L)))
  }
}
