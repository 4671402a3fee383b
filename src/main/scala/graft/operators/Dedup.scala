package graft.operators

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the whole point of each variant):
  *  - exact: one hash-aggregate shuffle on the dedup key. At 100 TB the
  *    map-side partial aggregation collapses duplicates before the
  *    exchange, so the shuffle carries ~|distinct| rows.
  *  - minhash/simhash: O(n) signature computation + a self-join that only
  *    touches LSH-bucket collisions — never the O(n²) pair space. The
  *    band/bucket join shuffles on (band, signature), and exact
  *    verification runs only on candidates.
  *  - ngram-jaccard: exact semantics, but candidate generation via a
  *    shared-shingle join (a pair with Jaccard ≥ t shares ≥ 1 shingle), so
  *    it is still join-shaped, not cross-join-shaped. Hot shingles are
  *    capped (stop-shingle cut) to bound skew — the standard trick for
  *    web-scale exact-verify dedup.
  *  - embedding: pairwise cosine restricted by a cheap blocking key when
  *    requested; the exact all-pairs form is for oracle-scale data and
  *    recall baselines.
  */
object Dedup {

  /** Exact dedup: one representative (min id) + multiplicity per key. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Shingle sets per doc: (id, shingles array, size). */
  private def withShingleSets(docs: DataFrame, idCol: String, textCol: String,
                              k: Int): DataFrame =
    docs.select(col(idCol),
      TF.shingleSet(col(textCol), k).as("sh"))
      .withColumn("sh_n", size(col("sh")))
      .filter(col("sh_n") > 0)

  /** Exact n-gram (word k-shingle) Jaccard near-dup pairs, candidate
    * generation by shared shingle. Emits (id_a, id_b, jaccard) for
    * jaccard >= threshold, id_a < id_b. Exact: a pair at threshold > 0
    * must share a shingle, so the shingle join loses nothing. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.8,
                        maxShinglePostings: Int = 100000): DataFrame = {
    val sets = withShingleSets(docs, idCol, textCol, k)
    val postings = sets.select(col(idCol).as("id"), explode(col("sh")).as("shingle"))
    // Posting-list formulation: the shingle self-join COUNTS the exact
    // distinct-shingle intersection I per pair, and Jaccard follows as
    // I/(nA+nB-I) — no per-pair array materialization, so the cost is
    // Σ_shingle df² (join-shaped), not O(n²)·|shingles|.
    // Stop-shingle cut: shingles with df > maxShinglePostings can't
    // discriminate and would explode the join quadratically; at the
    // default cap this only drops boilerplate shingles (undercounting I
    // for pairs that were far below threshold anyway).
    val df = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
    val rare = postings.join(df.filter(col("df") <= maxShinglePostings), "shingle")
    val l = rare.select(col("id").as("id_a"), col("shingle"))
    val r = rare.select(col("id").as("id_b"), col("shingle"))
    val inter = l.join(r, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("i"))
    val sizes = sets.select(col(idCol), col("sh_n"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sh_n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sh_n").as("n_b")), "id_b")
      .withColumn("jaccard", col("i").cast("double") /
        (col("n_a") + col("n_b") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: nHashes min-hashes over the shingle set, computed
    * as nHashes independent min-aggregations over exploded shingles
    * (xxhash64 seeded per hash index). O(n·|shingles|), fully codegen'd. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, nHashes: Int = 64): DataFrame = {
    val sets = withShingleSets(docs, idCol, textCol, k)
    val exploded = sets.select(col(idCol), explode(col("sh")).as("shingle"))
    val mins = (0 until nHashes).map(j =>
      min(xxhash64(lit(j), col("shingle"))).as(s"h$j"))
    exploded.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until nHashes).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** MinHash + banded LSH near-dup: candidates from band-bucket collisions,
    * then EXACT Jaccard verification — the output semantics are therefore
    * identical to [[ngramJaccardPairs]] (LSH only prunes the pair space).
    * bands×rowsPerBand = nHashes; P(miss | jaccard=s) = (1-s^r)^b. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          k: Int = 3, threshold: Double = 0.8,
                          bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, k, bands * rowsPerBand)
    val banded = sigs.select(col(idCol).as("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("id").as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col("id").as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sets = withShingleSets(docs, idCol, textCol, k)
    val a = sets.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sets.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", TF.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over word shingles: per-bit majority vote of shingle
    * hashes. Computed with 64 conditional-sum aggregations over the
    * exploded shingles — one shuffle, no UDF. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 2): DataFrame = {
    val exploded = withShingleSets(docs, idCol, textCol, k)
      .select(col(idCol), explode(col("sh")).as("shingle"))
      .withColumn("h", xxhash64(col("shingle")))
    val votes = (0 until 64).map(b => sum(TF.simhashVote(col("h"), b)).as(s"v$b"))
    exploded.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(b =>
          when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup: pairs with Hamming distance <= maxHamming. Banding:
    * split 64 bits into (maxHamming+1) chunks covering ALL bits — a pair
    * within the radius must agree exactly on >= 1 chunk (pigeonhole), so
    * the join is bucket-shaped, never O(n²). Radius/chunk-width is the
    * recall-vs-join-fanout knob: wider chunks (smaller radius) keep
    * buckets sparse at larger corpus sizes. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          k: Int = 2, maxHamming: Int = 12): DataFrame = {
    val chunks = maxHamming + 1
    val base = 64 / chunks
    val extra = 64 % chunks
    // chunk c covers [offset, offset+width): first `extra` chunks one wider
    val widths = (0 until chunks).map(c => if (c < extra) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val sigs = simhashSignatures(docs, idCol, textCol, k)
    val banded = sigs.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("simhash"), offsets(c))
          .bitwiseAND(lit((1L << widths(c)) - 1))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "key")
    val l = banded.select(col("id").as("id_a"), col("simhash").as("sig_a"), col("chunk"), col("key"))
    val r = banded.select(col("id").as("id_b"), col("simhash").as("sig_b"), col("chunk"), col("key"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs (exact all-pairs form — the recall
    * baseline; the ANN path for scale is Similarity.lshTopK). */
  def embeddingNearDupPairs(embeddings: DataFrame, idCol: String,
                            vecCol: String, threshold: Double): DataFrame = {
    val withNorm = embeddings.select(col(idCol),
      VF.toDouble(col(vecCol)).as("e"))
      .withColumn("nrm", VF.norm(col("e")))
    val a = withNorm.select(col(idCol).as("id_a"), col("e").as("e_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col("e").as("e_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VF.cosineWithNorms(col("e_a"), col("e_b"), col("n_a"), col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
