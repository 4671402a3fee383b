package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CROSS-TABLE ENTITY RESOLUTION — the R-S (two-relation) fuzzy join the
  * self-join dedup family doesn't cover: match records of two DIFFERENT
  * tables whose normalized names share character-n-gram Jaccard ≥ t
  * (customer↔supplier, vendor↔payee, account↔account across systems).
  *
  * Blocking is the R-S form of the PPJoin prefix filter: both sides'
  * grams are ranked under ONE GLOBAL document-frequency order (df
  * counted over the UNION of both tables — the lemma needs a shared
  * total order), each record keeps its |x| − ⌈t·|x|⌉ + 1 rarest grams,
  * and only prefix∩prefix gram matches become candidates — the join
  * fans out on long-tail keys, never on ubiquitous grams (stop-gram cut
  * bounds worst-case df). Candidates then verify EXACTLY (set
  * intersection), so blocking affects cost, never results. At 100 TB
  * the shape is: two scans, one vocab-scale df aggregate, a candidate
  * join on rare keys, and an O(candidates) verify — no cross product
  * anywhere. */
object EntityResolution {

  /** Distinct character k-grams of a normalized (lowercased) string;
    * empty when shorter than k. */
  private[graft] def charGrams(s: Column, k: Int): Column = {
    val lowered = lower(s)
    when(length(lowered) >= k,
      array_distinct(transform(
        sequence(lit(1), length(lowered) - (k - 1)),
        i => lowered.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** All (left id, right id, jaccard) pairs with char-k-gram Jaccard
    * ≥ `threshold` between `left.textCol` and `right.textCol`. */
  def fuzzyJoin(left: DataFrame, leftId: String, leftText: String,
                right: DataFrame, rightId: String, rightText: String,
                k: Int = 3, threshold: Double = 0.8,
                maxGramPostings: Int = 100000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "fuzzyJoin: threshold must be in (0, 1]")
    def sets(df: DataFrame, id: String, text: String) =
      df.select(col(id).as("id"), charGrams(col(text), k).as("g"))
        .withColumn("n", size(col("g")))
        .filter(col("n") > 0)
    val ls = sets(left, leftId, leftText)
    val rs = sets(right, rightId, rightText)
    def postings(s: DataFrame, side: String) =
      s.select(col("id"), col("n"), explode(col("g")).as("gram"))
        .withColumn("side", lit(side))
    val all = postings(ls, "L").unionByName(postings(rs, "R"))
    // global df over BOTH sides (the shared total order the prefix
    // lemma requires); df=1 grams cannot produce a cross pair, and
    // ubiquitous grams cannot discriminate — both cut before ranking
    val dfreq = all.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxGramPostings)
    val ranked = all.join(dfreq, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("side"), col("id"))
          .orderBy(col("df"), col("gram"))))
    val prefixLen = col("n") - ceil(lit(threshold) * col("n")).cast("int") + 1
    val prefix = ranked.filter(col("rn") <= prefixLen)
    val candidates = prefix.filter(col("side") === "L")
      .select(col("id").as("id_a"), col("gram"))
      .join(prefix.filter(col("side") === "R")
        .select(col("id").as("id_b"), col("gram")), "gram")
      .select("id_a", "id_b").distinct()
    // exact verification — blocking never decides membership. The
    // intersection lands behind a projection alias so the interpreted
    // set op evaluates once per candidate, not once per reference.
    candidates
      .join(ls.select(col("id").as("id_a"), col("g").as("g_a"),
        col("n").as("n_a")), "id_a")
      .join(rs.select(col("id").as("id_b"), col("g").as("g_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("__i", size(array_intersect(col("g_a"), col("g_b"))))
      .withColumn("jaccard", col("__i").cast("double") /
        (col("n_a") + col("n_b") - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
