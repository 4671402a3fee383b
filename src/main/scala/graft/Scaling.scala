package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor SCALING evidence: per-query empirical growth exponents —
  * the plan property the single-SF bench number cannot see. A query whose
  * time grows super-linearly in input rows has a plan bug (an accidental
  * all-pairs, a broadcast that became a shuffle, a skewed bucket) no
  * matter how fast its sf0.1 number looks.
  *
  * Two measurements per query:
  *  - `alpha_small`: exponent between sf0.01 and sf0.1 (10× rows);
  *  - `alpha_large` (dedup/ANN subset): exponent between sf0.1 and a
  *    SYNTHETIC ×8 corpus built by replicating sf0.1 with DECORRELATED
  *    replicas — texts carry a replica tag (no cross-replica exact or
  *    near dups) and embeddings are circularly shifted per replica
  *    (norms and within-replica neighbor structure preserved, replicas
  *    mutually near-orthogonal) — so the WORKLOAD scales linearly by
  *    construction and any super-linear time is the plan's fault, not
  *    the data's.
  *
  * Exponent = ln(t_big/t_small) / ln(rows_big/rows_small), median-of-3
  * timings. O(n) → 1.0; O(n log n) at these sizes → ≈1.08; the gate in
  * tools/check_bench.py flags > 1.35 (noise margin) for queries whose
  * large-scale time is big enough to measure. Artifact:
  * `target/scaling.json`.
  */
object Scaling {

  /** Queries with a two-point sf0.01→sf0.1 exponent. */
  private val smallSubset = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q9_product_profit",
    "q18_large_orders", "q_window_topk", "q_range_join",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
    "dedup_embedding_lsh", "dedup_canonical",
    "sim_topk_exact", "sim_topk_ivf", "sim_topk_pq",
    "text_quality_filter", "text_tfidf", "train_corpus_prep_v2",
    // round-6 additions: retrieval, co-occurrence, LM scoring, graph,
    // tokenizer training — each with a non-obvious scale shape worth
    // pinning (posting filters, pair explosion, iterative rounds)
    "text_bm25", "text_pmi", "text_bigram_logprob", "graph_pagerank",
    "text_bpe_merges",
    // round-9: the incremental canonicalization fold — THE operator whose
    // scale shape matters most (per-batch cost must track the batch, so
    // the 3-batch fold must grow ~linearly in corpus size like the
    // one-shot), plus the host-keyed exact cut
    "dedup_canonical_incremental", "dedup_host_keys",
    // round-9 session additions: tokenizer apply (vocab-scale replace
    // chain), model scoring (per-row), the closure×classifier
    // representative pick, and the source-mix drift report
    "text_bpe_encode", "text_quality_classifier",
    "dedup_cluster_representatives", "text_composition_drift",
    // second continued session: the DSIR two-pass score (must stay
    // linear — model build + scan), LPA's per-round O(E) join-agg
    "sample_importance", "graph_lpa",
    // round-10: the full continuous-maintenance chain — stream epochs →
    // canonical deltas → merge lake → keyed view. Its O(changes) claim
    // is per-stage by construction; this pins the COMPOSED gate's
    // empirical growth (stream machinery overhead is constant, so the
    // measured exponent should sit well under 1)
    "dedup_canonical_chain",
    // round-12: containment is a self-join dedup (the quadratic-risk
    // class this gate exists for) — its prefix filter keeps NO stop-gram
    // cut on the b side, so its growth shape must be pinned, not assumed
    "dedup_containment",
    // round-13 continuation: the substring run-merge is an anchor
    // SELF-JOIN (Σ df·(df−1) fan-out — quadratic-risk, budget-guarded);
    // its incremental index must additionally keep per-batch cost
    // tracking the batch; the trained probe is fixed-iteration
    // aggregates over a per-doc frame and must stay linear
    "text_dedup_substrings", "text_dedup_substrings_incremental",
    "text_quality_probe",
    // weighted Jaccard is the same budget-guarded postings self-join
    // class as the substring anchors
    "dedup_weighted_jaccard",
    // round-14: the banded cross-set decontamination join (LSH-candidate
    // class), the packed loss-mask artifact (coverage shuffle + packing
    // window), and the held-out-label probe (label join + fixed-iteration
    // GD aggregates) — all must stay ~linear. multimodal_dedup reads a
    // fixed-size fixture, so an sf exponent would be meaningless for it.
    "text_decontaminate_fuzzy", "train_loss_mask",
    "text_quality_probe_holdout",
    // round-14 close session: the sweep shares the loosest-threshold
    // candidate pass — its growth must track the single-threshold join
    // (same PPJoin class), not multiply by the sweep size
    "dedup_threshold_sweep",
    // round-15: the sweep family's other two members (containment's
    // prefix join, weighted Jaccard's budget-guarded postings self-join)
    // and the tenant-purge cascade (3 per-tenant index builds + the
    // offboarding scrub — must track the corpus, not multiply by it)
    "dedup_containment_sweep", "dedup_weighted_sweep",
    "pipe_tenant_purge_derived")

  /** Dedup/ANN/flagship queries also measured on the synthetic ×8 corpus
    * (documents+embeddings only — the tables this subset reads). */
  private val synthSubset = Seq(
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
    "dedup_embedding_lsh", "sim_topk_ivf", "sim_topk_pq",
    "text_quality_filter", "train_corpus_prep_v2", "dedup_containment",
    "text_dedup_substrings")

  private val SynthReplicas = 8

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // local-mode only (same rationale as Bench): avoid parallel-listing
      // jobs over many-small-file fixture dirs
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect() // JVM warm
    val json = run(spark, if (args.isEmpty) None else Some(args.toSet))
    // a filtered run is an iteration aid — never clobber the artifact
    if (args.isEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/root/repo/target/scaling.json"), json + "\n")
    println(json)
    spark.stop()
  }

  /** Measure every exponent and return the artifact JSON (stderr-only
    * progress) — factored out so Bench can regenerate the artifact each
    * round inside its own session without clobbering its stdout line.
    * `only`: optional query-name filter (CLI args) for fast iteration on
    * one operator's exponent without the full ~20 min sweep.
    * `knownBig`: already-measured sf0.1 medians from the SAME session
    * (Bench passes its per-entry medians — median-of-3 with warm-up and
    * retry adjudication, a strictly stronger measurement than this
    * sweep's bare median-of-3) — entries present there skip the sf0.1
    * re-timing leg. Standalone runs pass nothing and measure all legs. */
  def run(spark: SparkSession, only: Option[Set[String]] = None,
          knownBig: Map[String, Double] = Map.empty): String = {
    val sfSmall = "/root/testdata/sf0.01"
    val sfBig = "/root/testdata/sf0.1"
    // v2: per-word replica tagging (true shingle decorrelation) — new
    // dir so a stale v1 corpus left by an earlier round never satisfies
    // the _SYNTH_OK check
    val synthDir = SynthDir
    ensureSynth(spark, sfBig, synthDir)

    def quiesce(): Unit = {
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => })
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // Host-state context for cross-window exponents (r16 ADVICE): the
    // sf0.1 legs may be reused from bench medians measured up to an hour
    // earlier, while the sf0.01/synth legs are timed NOW — under the
    // documented hours-long contention windows the two legs can sit in
    // different regimes. Each leg therefore records its offset from the
    // sweep start, and a canary series (the bench's fixed CPU-bound
    // probe, min-of-2) brackets the sweep, so a suspicious exponent is
    // attributable to a machine window instead of guessed at.
    val sweepT0 = System.nanoTime()
    def offsetSec(): Double = (System.nanoTime() - sweepT0) / 1e9
    def canaryProbe(): Double = {
      quiesce()
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(3000000000L)
          .selectExpr("sum(cast(id as double) * cast(id as double))").head()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val canaries = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    def recordCanary(): Unit = { canaries += ((offsetSec(), canaryProbe())); () }
    // The LSH blocker's bucket count is ITS scale knob (nBits ~ log2 n:
    // fixed buckets make within-bucket pairing quadratic by design, which
    // the operator's scaladoc documents). The synthetic ×8 point therefore
    // measures it at nBits+3 — the same discipline a deployment follows —
    // while every other query runs its gated form unchanged.
    def fnFor(name: String, dir: String): (SparkSession, String) => DataFrame =
      if (name == "dedup_embedding_lsh" && dir.contains("sf_synth"))
        (s, d) => graft.operators.Dedup.embeddingNearDupPairsLsh(
          Tables.load(s, d, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, nBits = 9)
      else SparkEntry.queries(name)
    // Rep protocol (r17, disclosed in OPTIMIZATION_r17.md): the legs this
    // sweep still times itself (sf0.01 + synth — the sf0.1 legs reuse the
    // same session's bench medians) run MIN-OF-2 instead of median-of-3.
    // Rationale: the standing methodology's own premise — external
    // contention only ever inflates a timing — makes the min the robust
    // cheap estimator, and the third rep bought ~6 min of the r16 driver
    // wall (44 sf0.01 legs + 11 synth legs, train_corpus_prep_v2's synth
    // leg alone 23.6 s/rep). Bias note: a min sits a few % under a
    // median, so alpha_small (t1 in the denominator) shifts a few
    // hundredths CONSERVATIVE (up) and alpha_large (t3 in the numerator)
    // a few hundredths optimistic (down) — noise against the 1.35 gate
    // with measured alphas 0.1–1.1.
    def time(name: String, dir: String): Double = {
      val fn = fnFor(name, dir)
      val ts = (1 to 2).map { _ =>
        quiesce()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    recordCanary()
    val subset = smallSubset.filter(q => only.forall(_.contains(q)))
    val entries = subset.zipWithIndex.map { case (q, i) =>
      if (i > 0 && i % 15 == 0) recordCanary()
      val at1 = offsetSec()
      val t1 = time(q, sfSmall)
      val reused = knownBig.contains(q)
      val at2 = offsetSec()
      val t2 = knownBig.getOrElse(q, time(q, sfBig))
      val aSmall = math.log(t2 / t1) / math.log(10.0)
      val (tS, aLarge, at3) =
        if (synthSubset.contains(q)) {
          val a3 = offsetSec()
          val t3 = time(q, synthDir)
          (Some(t3), Some(math.log(t3 / t2) / math.log(SynthReplicas.toDouble)),
            Some(a3))
        } else (None, None, None)
      System.err.println(f"[scaling] $q%-24s t01=$t1%6.2f t1=$t2%6.2f " +
        f"a_small=$aSmall%5.2f" + tS.map(t => f" t_synth=$t%7.2f " +
        f"a_large=${aLarge.get}%5.2f").getOrElse(""))
      val extra = tS.map(t =>
        s""","t_synth":${fmt(t)},"alpha_large":${fmt(aLarge.get)}""").getOrElse("")
      // leg timestamps (sec offsets from sweep start; t_sf01's is null
      // when the leg is a bench-median reuse — its window is the bench's)
      val ats = s""","at":[${fmt(at1)},${if (reused) "null" else fmt(at2)}""" +
        at3.map(a => s",${fmt(a)}").getOrElse("") + "]"
      s""""$q":{"t_sf001":${fmt(t1)},"t_sf01":${fmt(t2)},"alpha_small":${fmt(aSmall)}$extra$ats}"""
    }
    recordCanary()
    val canaryJson = canaries.map { case (at, s) => f"[${fmt(at)},${fmt(s)}]" }
      .mkString("[", ",", "]")
    s"""{"rows_ratio_small":10,"rows_ratio_large":$SynthReplicas,""" +
      s""""reps":"min-of-2 (sf0.1 legs reuse the session's bench medians)",""" +
      s""""canary":$canaryJson,""" +
      s""""queries":{${entries.mkString(",")}}}"""
  }

  private def fmt(d: Double): String = "%.4f".format(d)

  /** The decorrelated ×8 corpus dir, shared with [[AnnRecall]]'s
    * synth-scale recall point (both instruments must measure the SAME
    * corpus or the scale claims stop composing). */
  private[graft] val SynthDir = "/root/repo/target/sf_synth_v2"

  /** The ×16 embeddings-only synth dir — AnnRecall's THIRD recall scale
    * point (sf0.1 → ×8 → ×16), pinning that the probe-scaled rerank
    * shortlist holds recall as nCells keeps growing with √n. */
  private[graft] val SynthX16Dir = "/root/repo/target/sf_synth_x16"

  /** The ×32 embeddings-only synth dir — the FOURTH recall scale point
    * (64k vectors, √n cells ≈ 253): the shift step is dim/32 = 2, still
    * decorrelating distinct replicas. */
  private[graft] val SynthX32Dir = "/root/repo/target/sf_synth_x32"

  /** EMBEDDINGS-ONLY decorrelated ×`replicas` synth (the ANN third scale
    * point needs no documents): same circular-shift construction as
    * [[ensureSynth]] — norm and within-replica geometry exactly
    * preserved, distinct shifts mutually decorrelated. `replicas` must
    * divide the vector dim or the shift step truncates to 0 and replicas
    * collide (fail loud). */
  private[graft] def ensureSynthEmbeddings(spark: SparkSession, sfBig: String,
                                           dir: String, replicas: Int): Unit = {
    val done = new java.io.File(s"$dir/_SYNTH_OK")
    if (done.exists) return
    val embs = Tables.load(spark, sfBig, "embeddings")
    val idOffset = 100000000L
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    require(dim % replicas == 0 && dim / replicas >= 1,
      s"ensureSynthEmbeddings: dim=$dim not divisible by replicas=$replicas")
    val reps = spark.range(replicas).select(col("id").cast("int").as("rep"))
    embs.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * idOffset)
      .withColumn("embedding",
        concat(
          slice(col("embedding"), col("rep") * (dim / replicas) + 1,
            lit(dim) - col("rep") * (dim / replicas)),
          slice(col("embedding"), lit(1), col("rep") * (dim / replicas))))
      .drop("rep")
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    done.getParentFile.mkdirs()
    done.createNewFile()
    ()
  }

  /** Build the decorrelated ×N replica corpus (documents + embeddings)
    * once; replicas are deterministic functions of (replica, row). */
  private[graft] def ensureSynth(spark: SparkSession, sfBig: String, dir: String): Unit = {
    val done = new java.io.File(s"$dir/_SYNTH_OK")
    if (done.exists) return
    val docs = Tables.load(spark, sfBig, "documents")
    val embs = Tables.load(spark, sfBig, "embeddings")
    val idOffset = 100000000L
    val reps = spark.range(SynthReplicas).select(col("id").cast("int").as("rep"))
    docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * idOffset)
      // EVERY word carries the replica tag — a per-replica BIJECTION on
      // the vocabulary, so within-replica shingle/dup structure is
      // preserved verbatim while cross-replica shingle sets are fully
      // disjoint. (A tag merely APPENDED to the text — the previous
      // form — leaves all mid-text shingles shared across replicas:
      // replica clones sit at word-shingle Jaccard ≈ (s−1)/(s+1) ≈ 0.96,
      // so the "decorrelated" corpus actually carried 5000 cross-replica
      // 8-cliques ≈ 150k extra near-dup pairs and shingle dfs that grow
      // ×replicas — the workload itself was super-linear and the
      // measured α was blamed on the plan.)
      .withColumn("text",
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1zr"), col("rep"))))
      .drop("rep")
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    embs.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * idOffset)
      // circular shift by rep·(dim/SynthReplicas): norm and within-replica
      // geometry exactly preserved; distinct shifts of the same vectors
      // are mutually decorrelated
      .withColumn("embedding",
        concat(
          slice(col("embedding"), col("rep") * (dim / SynthReplicas) + 1,
            lit(dim) - col("rep") * (dim / SynthReplicas)),
          slice(col("embedding"), lit(1), col("rep") * (dim / SynthReplicas))))
      .drop("rep")
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    done.getParentFile.mkdirs()
    done.createNewFile()
    ()
  }
}
