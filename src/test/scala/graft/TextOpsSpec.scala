package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Specs for the corpus-hygiene text operators: decontamination,
  * quality-rule filtering, TF-IDF, PII redaction. The oracle gate covers
  * the fixture corpus; these pin the operator SEMANTICS on crafted
  * inputs where each rule/pattern is exercised on purpose. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("ngram novelty: df-1 fraction per doc, hand-computed") {
    // doc 1: "a b c d" → shingles {a b c, b c d}; doc 2 shares "a b c"
    // but not "b c d"; doc 3 is fully unique; doc 4 is too short (no
    // shingles → excluded)
    val corpus = docsDf(
      1L -> "a b c d",
      2L -> "a b c",
      3L -> "x y z w",
      4L -> "one two")
    val out = TextAnalysis.ngramNovelty(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, 0.5),  // "b c d" is unique, "a b c" shared with doc 2
      (2L, 1L, 0L, 0.0),  // its one shingle is shared
      (3L, 2L, 2L, 1.0))) // fully novel
  }

  test("decontaminate flags exactly the train docs sharing a k-gram") {
    val evalSet = docsDf(
      100L -> "the quick brown fox jumps over the lazy dog tonight")
    val train = docsDf(
      1L -> "intro words the quick brown fox jumps over the lazy dog tonight and more", // contains the eval 8-grams
      2L -> "the quick brown fox stops here",                                          // < 8-gram overlap only
      3L -> "completely unrelated text with no shared phrases at all today")
    val out = Dedup.decontaminate(train, evalSet, "doc_id", "text", k = 8)
      .orderBy("train_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    // "the quick brown fox jumps over the lazy dog tonight" = 10 tokens
    // → 3 distinct 8-grams, all present in doc 1
    assert(out.head.getLong(1) == 3L)
    assert(out.head.getLong(2) == 1L)
  }

  test("decontaminate: self-decontamination flags every doc with >= k tokens") {
    val corpus = docsDf(
      1L -> "one two three four five six seven eight nine",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "too short to have any eight gram")  // 7 tokens → no 8-gram
    val out = Dedup.decontaminate(corpus, corpus, "doc_id", "text", k = 8)
    // docs 1 and 2 share their own 8-grams; doc 3 is sub-k and can never
    // be flagged (or contaminate)
    assert(out.select("train_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("bm25: hand-computed tiny corpus ranks and scores") {
    // 3 docs, query = {cat}; df(cat)=2, N=3, dl = 4/4/4, avgdl = 4
    // idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    // doc 1: tf=2 → contrib = idf*2*2.2/(2+1.2*(0.25+0.75*1)) = idf*4.4/3.2
    // doc 2: tf=1 → contrib = idf*2.2/(1+1.2*1.0) = idf*2.2/2.2 = idf
    val corpus = docsDf(
      1L -> "cat cat dog bird",
      2L -> "cat dog bird fish",
      3L -> "dog bird fish worm")
    val out = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("cat"), topK = 10)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3: no match
    val idf = math.log(1.6)
    val c1 = BigDecimal(idf * (2.0 * 2.2) / (2.0 + 1.2 * (1.0 - 0.75 + 0.75 * 4.0 / 4.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c2 = BigDecimal(idf * (1.0 * 2.2) / (1.0 + 1.2 * (1.0 - 0.75 + 0.75 * 4.0 / 4.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(3) == c1 && out(1).getDouble(3) == c2)
    assert(out.forall(_.getLong(1) == 4L)) // doc_len
  }

  test("bm25: rarer term outweighs common term at equal tf; topK bounds output") {
    // "rare" appears in 1 of 12 docs, "common" in all 12 → idf(rare) >> idf(common)
    val corpus = docsDf((1L to 12L).map { i =>
      i -> (if (i == 1) "rare common filler pad" else "common filler pad word")
    }: _*)
    val both = TextAnalysis.bm25(corpus, "doc_id", "text",
      Seq("rare", "common"), topK = 3).collect()
    assert(both.length == 3 && both.head.getLong(0) == 1L)
    assert(both.head.getLong(2) == 2L) // doc 1 matched both terms
    // longer doc with same tf scores lower (length normalization)
    val ln = docsDf(
      1L -> "cat dog",
      2L -> "cat dog bird fish worm mouse horse cow")
    val out = TextAnalysis.bm25(ln, "doc_id", "text", Seq("cat"), topK = 10)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(3) > out(1).getDouble(3))
  }

  test("pmi: window bounds, symmetrization, and hand-computed value") {
    // "a b c d e": window 2 pairs = (a,b)(a,c)(b,c)(b,d)(c,d)(c,e)(d,e) = 7
    val corpus = docsDf(1L -> "a b c d e")
    val out = TextAnalysis.pmiCooccurrence(corpus, "doc_id", "text",
      window = 2, minCount = 1).collect()
    assert(out.length == 7)
    // (a,d) is at distance 3 > window — absent
    assert(!out.exists(r => r.getString(0) == "a" && r.getString(1) == "d"))
    // every pair is lexicographically ordered
    assert(out.forall(r => r.getString(0) <= r.getString(1)))
    // hand-check (a,b): n_pair=1, n_a=n_b=1, T_pairs=7, T_uni=5
    // pmi = ln((1/7) / ((1/5)*(1/5))) = ln(25/7)
    val ab = out.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    val exp = BigDecimal(math.log((1.0 / 7.0) / ((1.0 / 5.0) * (1.0 / 5.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ab.getLong(2) == 1L && ab.getDouble(5) == exp)
  }

  test("pmi: repeated co-occurrence scores above chance, minCount prunes") {
    // "x y" always together; "p"/"q" never adjacent across docs
    val corpus = docsDf(
      1L -> "x y p", 2L -> "x y q", 3L -> "x y p", 4L -> "x y q")
    val out = TextAnalysis.pmiCooccurrence(corpus, "doc_id", "text",
      window = 1, minCount = 1)
    val xy = out.filter(col("a") === "x" && col("b") === "y").collect()
    assert(xy.length == 1 && xy.head.getDouble(5) > 0.0) // above independence
    // minCount=4 keeps only the (x,y) pair (4 occurrences)
    val pruned = TextAnalysis.pmiCooccurrence(corpus, "doc_id", "text",
      window = 1, minCount = 4).collect()
    assert(pruned.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("x", "y")))
  }

  test("vocabulary: rank order, cumulative coverage reaches 1 at full vocab") {
    val corpus = docsDf(1L -> "a a a b b c")
    val v = TextAnalysis.vocabulary(corpus, "text", topK = 10).collect()
    assert(v.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(v.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L))
    assert(v.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    assert(v.map(_.getDouble(3)).toSeq == Seq(0.5, 5.0 / 6.0, 1.0)
      .map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // truncation: topK=1 keeps only the head of the curve
    assert(TextAnalysis.vocabulary(corpus, "text", topK = 1).count() == 1)
  }

  test("bigram surprisal: deterministic continuations score 0, rare ones high") {
    // "x" is always followed by "y" → P(y|x)=1 → surprisal 0;
    // "p q" vs "p r": P(q|p)=P(r|p)=0.5 → ln 2
    val corpus = docsDf(1L -> "x y", 2L -> "x y", 3L -> "p q", 4L -> "p r")
    val out = TextAnalysis.bigramLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(3L) == ln2 && out(4L) == ln2)
    // single-token docs have no bigrams and drop out
    assert(!TextAnalysis.bigramLogProb(docsDf(9L -> "solo"), "doc_id", "text")
      .collect().map(_.getLong(0)).contains(9L))
  }

  test("decontaminate broadcast and shuffle paths agree") {
    val all = spark.read.parquet(s"$sf0001/documents.parquet")
    val train = all.filter(col("doc_id") % 10 =!= 0)
    val ev = all.filter(col("doc_id") % 10 === 0)
    val b = Dedup.decontaminate(train, ev, "doc_id", "text", k = 8)
    val s = Dedup.decontaminate(train, ev, "doc_id", "text", k = 8,
      broadcastEval = Some(false))
    assert(b.exceptAll(s).isEmpty && s.exceptAll(b).isEmpty)
  }

  test("qualityFilter rules fire individually") {
    val docs = docsDf(
      1L -> ("the good doc with plenty of different words " +
        "and a reasonable spread of the usual content here today now then".trim),
      2L -> "the tiny doc",                                    // n_words < 20
      3L -> Seq.fill(30)("spam").mkString(" "),                // top-word dominance + dup bigrams
      4L -> Seq.tabulate(30)(i => s"w$i").mkString(" "))       // no stopword
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(!byId(2L).getAs[Boolean]("keep") && byId(2L).getLong(1) < 20)
    assert(!byId(3L).getAs[Boolean]("keep") &&
      byId(3L).getAs[Double]("top_word_frac") == 1.0 &&
      byId(3L).getAs[Double]("dup_bigram_frac") > 0.9)
    assert(!byId(4L).getAs[Boolean]("keep") &&
      !byId(4L).getAs[Boolean]("has_stopword"))
  }

  test("qualityScore: good text scores above spam and the logit is bit-stable") {
    val docs = docsDf(
      1L -> ("the good doc with plenty of different words " +
        "and a reasonable spread of the usual content here today now then"),
      2L -> Seq.fill(30)("spam").mkString(" "),  // dominance + dup bigrams
      3L -> "")                                   // zero tokens
    val out = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val good = byId(1L).getAs[Double]("quality_logit")
    val spam = byId(2L).getAs[Double]("quality_logit")
    assert(good > spam, s"expected good ($good) > spam ($spam)")
    assert(byId(1L).getAs[Boolean]("pred_keep") && byId(1L).getAs[Boolean]("rule_keep"))
    assert(!byId(2L).getAs[Boolean]("pred_keep"))
    // zero-token doc: counts pin to 0, so the logit is exactly
    // bias + the mean-word-len deviation term (-1.0 + -0.2*|0-5|) —
    // never null, decision deterministically false
    assert(byId(3L).getAs[Double]("quality_logit") == -2.0)
    assert(!byId(3L).getAs[Boolean]("pred_keep"))
    // re-running yields bit-identical logits (fixed-order double arithmetic)
    val again = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[Double]("quality_logit"))
    assert(again.toSeq == out.map(_.getAs[Double]("quality_logit")).toSeq)
  }

  test("compositionDrift: dense spine, hand-checked shares and TVD") {
    import spark.implicits._
    // epoch = id % 2; source B present only in epoch 0 -> must still get
    // an epoch-1 row with share 0 and a -0.5 movement
    val docs = Seq(
      (0L, "a b", "A"), (2L, "c d", "B"),   // epoch 0: A .5, B .5
      (1L, "e f g", "A"), (3L, "h i", "A")) // epoch 1: A 1.0, B 0
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.compositionDrift(docs, "doc_id", "text", "source",
      nEpochs = 2).orderBy("epoch", "source").collect()
    assert(out.length == 4) // 2 sources x 2 epochs, densified
    val e1B = out.find(r => r.getInt(0) == 1 && r.getString(1) == "B").get
    assert(e1B.getLong(2) == 0L && e1B.getAs[Double]("doc_share") == 0.0)
    assert(e1B.getAs[Double]("share_delta") == -0.5)
    // epoch-1 TVD = 0.5 * (|+0.5| + |-0.5|) = 0.5 on every epoch-1 row
    out.filter(_.getInt(0) == 1).foreach { r =>
      assert(r.getAs[Double]("epoch_tvd") == 0.5) }
    // epoch 0 has no predecessor: null movement, null TVD
    out.filter(_.getInt(0) == 0).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("share_delta")))
      assert(r.isNullAt(r.fieldIndex("epoch_tvd"))) }
  }

  test("qualityFilter rejects zero-token docs deterministically (never null)") {
    // minWords = 0 used to make `keep` = true && null = null for empty docs
    val docs = docsDf(1L -> "", 2L -> "   ")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text", minWords = 0)
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("keep")), s"null keep for $r")
      assert(!r.getAs[Boolean]("keep"))
      assert(r.getAs[Double]("mean_word_len") == 0.0)
      assert(r.getAs[Double]("top_word_frac") == 0.0)
    }
  }

  test("unigramLogProb: rare-token docs score higher surprisal than common-token docs") {
    val docs = docsDf(
      1L -> Seq.fill(20)("the").mkString(" "),          // all high-frequency tokens
      2L -> "zxqv wvut qpon mlkj ihgf",                 // singletons only
      3L -> ("the " * 10 + "zxqv").trim)                // mixed
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val common = out(1L).getAs[Double]("mean_neg_logprob")
    val rare = out(2L).getAs[Double]("mean_neg_logprob")
    val mixed = out(3L).getAs[Double]("mean_neg_logprob")
    assert(out(1L).getAs[Long]("n_tokens") == 20)
    assert(common < mixed && mixed < rare,
      s"surprisal must order common < mixed < rare: $common, $mixed, $rare")
    // the corpus-wide distribution normalizes: total mass = 1 means the
    // most frequent token's surprisal is still positive
    assert(common > 0.0)
  }

  test("tfidf ranks corpus-rare terms above ubiquitous ones") {
    val docs = docsDf(
      1L -> "shared shared shared rare1",
      2L -> "shared shared shared rare2",
      3L -> "shared shared shared rare3")
    // "shared" appears in all docs → ln(3/3)=0; each rareN in one doc
    val out = TextAnalysis.tfidf(docs, "doc_id", "text", topK = 1)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("rare1", "rare2", "rare3"))
    assert(out.forall(_.getInt(5) == 1))
    // score = 1 * ln(3/1) rounded to 6 dp
    assert(out.forall(r => math.abs(r.getDouble(4) - 1.098612) < 1e-9))
  }

  test("packSequences: contiguous per-shard packing with exact boundaries") {
    // one shard (ids ≡ 0 mod 8), 300 tokens each, budget 512:
    // cum_before = 0, 300, 600 → seq 0@0, 0@300, 1@88
    val docs = docsDf(
      0L -> Seq.fill(300)("w").mkString(" "),
      8L -> Seq.fill(300)("w").mkString(" "),
      16L -> Seq.fill(300)("w").mkString(" "),
      1L -> Seq.fill(600)("w").mkString(" ")) // different shard: independent stream
    val out = TextAnalysis.packSequences(docs, "doc_id", "text",
        tokensPerSeq = 512, nShards = 8)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(3), r.getLong(4))).toMap // (shard, seq_id, offset)
    assert(byId(0L) == ((0L, 0L, 0L)))
    assert(byId(8L) == ((0L, 0L, 300L)))
    assert(byId(16L) == ((0L, 1L, 88L)))
    assert(byId(1L) == ((1L, 0L, 0L)), "shards pack independently")
  }

  test("piiRedact finds and replaces emails, IPs, and phones") {
    val docs = docsDf(
      1L -> "reach me at alice.smith+tag@mail-host.org or bob@x.io thanks",
      2L -> "server 10.0.0.1 and backup 192.168.255.254 call +1-555-0199",
      3L -> "clean text with nothing sensitive at all")
    val out = TextAnalysis.piiRedact(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 0 && out(0).getLong(3) == 0)
    assert(out(1).getLong(1) == 0 && out(1).getLong(2) == 2 && out(1).getLong(3) == 1)
    assert(out(2).getLong(1) == 0 && out(2).getLong(2) == 0 && out(2).getLong(3) == 0)
    // the redacted fingerprint equals the fingerprint of the expected text
    val expected = docsDf(
      1L -> "reach me at [EMAIL] or [EMAIL] thanks",
      2L -> "server [IP] and backup [IP] call [PHONE]",
      3L -> "clean text with nothing sensitive at all")
    val expFp = TextAnalysis.fingerprints(expected, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(out.map(_.getLong(4)).toSeq == expFp.toSeq)
  }

  test("chunk: windows tile with overlap, short docs get one chunk, empty docs none") {
    import spark.implicits._
    val words120 = (1 to 120).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words120), (2L, "just five words right here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text",
        chunkWords = 64, overlapWords = 16)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect()
    // doc 1: len 120 > 64 → ceil((120-64)/48)+1 = 3 chunks at 0/48/96
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 64L), (1L, 48L, 64L), (2L, 96L, 24L)))
    // neighbors share exactly the 16-word overlap
    assert(d1(0)._5.split(" ").takeRight(16).toSeq ==
      d1(1)._5.split(" ").take(16).toSeq)
    assert(d1(2)._5.split(" ").last == "w120", "final chunk reaches the end")
    // doc 2: one whole-doc chunk; doc 3: none
    assert(out.filter(_._1 == 2L).toSeq.map(c => (c._2, c._4)) == Seq((0L, 5L)))
    assert(!out.exists(_._1 == 3L))
  }

  test("shard manifest: totals partition the pack; checksum is order-insensitive") {
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text")
    val manifest = TextAnalysis.shardManifest(packed, "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(manifest.map(_._2).sum == docs.count(), "every doc in exactly one shard")
    val totalTokens = packed.agg(sum("n_tokens")).as[Long].head()
    assert(manifest.map(_._4).sum == totalTokens)
    // checksum must not depend on row order: recompute over a shuffled pack
    val reshuffled = TextAnalysis.shardManifest(
      packed.orderBy(rand(42)), "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(manifest.sortBy(_._1).map(m => (m._1, m._7)).toSeq ==
      reshuffled.sortBy(_._1).map(m => (m._1, m._7)).toSeq)
  }

  test("decontaminateFraction scores by shared-gram fraction and flags at tau") {
    import spark.implicits._
    val evalDoc = (1 to 16).map(i => s"e$i").mkString(" ") // 9 distinct 8-grams
    // train doc A = eval verbatim + 7 unique words → shares all 9 eval
    // grams plus 7 bridging+unique grams of its own (16 total) → 9/16
    val trainA = evalDoc + " " + (1 to 7).map(i => s"u$i").mkString(" ")
    // train doc B shares one 8-word window only → 1 shared gram
    val trainB = (1 to 8).map(i => s"e$i").mkString(" ") + " " +
      (1 to 8).map(i => s"v$i").mkString(" ")
    val train = Seq((1L, trainA), (2L, trainB)).toDF("doc_id", "text")
    val evalSet = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.decontaminateFraction(train, evalSet, "doc_id", "text",
        k = 8, tau = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    val a = out(0); val b = out(1)
    assert(a._3 == 9L && a._2 == 16L && a._5,
      s"doc A must share 9/16 grams and be flagged at tau=0.5: $a")
    assert(b._3 == 1L && b._2 == 9L && !b._5,
      s"doc B must share 1/9 grams and stay unflagged: $b")
  }

  test("urlCanonicalize: case, ports, www, fragments, tracking params, param order") {
    val cases = Seq(
      // equivalent mangled pairs collapse
      ("HTTP://WWW.Ex.COM:80/A/b/?z=1&utm_medium=m&a=2#frag",
        "http://ex.com/A/b?a=2&z=1"),
      ("http://ex.com/A/b?a=2&z=1", "http://ex.com/A/b?a=2&z=1"),
      // https default port; ref + gclid + fbclid dropped; byte sort
      ("https://Site.org:443/?ref=r&b=1&gclid=g&fbclid=f&a=9",
        "https://site.org?a=9&b=1"),
      // non-default port survives; path case preserved
      ("https://site.org:8443/Path/", "https://site.org:8443/Path"),
      // no scheme: stable pass-through of the steps that still apply
      ("www.ex.com/x/?utm_source=s", "ex.com/x"),
      // utm_ prefix only matches as a PARAM KEY, not a value
      ("https://ex.com/q?k=utm_source", "https://ex.com/q?k=utm_source"),
      // fragment-only and query-only degenerate forms
      ("https://ex.com#only-frag", "https://ex.com"),
      ("https://ex.com/?utm_source=x", "https://ex.com"),
      // userinfo stripped (blocklist-bypass guard): user@, user:pass@,
      // and a doubled @ all resolve to the real host
      ("https://alice@Blocked.Example.COM/x", "https://blocked.example.com/x"),
      ("https://u:p@www.blocked.example.com:443/x",
        "https://blocked.example.com/x"),
      ("https://a@b@blocked.example.com/x", "https://blocked.example.com/x"))
    val got = graft.operators.TextAnalysis.urlCanonicalize(
        cases.map(_._1).toDF("url"), "url")
      .select("url", "url_canon").as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"input $in") }
  }

  test("boilerplate prefixes: shared openings per group; short docs excluded") {
    val docs = Seq(
      // hostA: three docs share a cookie-banner opening, bodies differ
      (1L, "hostA", "we use cookies to improve your experience alpha beta"),
      (2L, "hostA", "we use cookies to improve nothing at all gamma"),
      (3L, "hostA", "we use cookies on this site delta"),
      // same opening on hostB: different group, only ONE doc -> no row
      (4L, "hostB", "we use cookies here too"),
      // hostB pair sharing a different opening
      (5L, "hostB", "breaking news today stocks fell"),
      (6L, "hostB", "breaking news today weather was fine"),
      // short docs (< k words) never group, even when identical
      (7L, "hostC", "hi there"),
      (8L, "hostC", "hi there"),
      (9L, "hostA", "unique opening words entirely different")
    ).toDF("doc_id", "host", "text")
    val got = graft.operators.TextAnalysis.boilerplatePrefixes(
        docs, "doc_id", "text", "host", k = 3, minDocs = 2L)
      .select("grp", "prefix", "n_docs", "min_doc_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("hostA", "we use cookies", 3L, 1L),
      ("hostB", "breaking news today", 2L, 5L)))
  }
}
