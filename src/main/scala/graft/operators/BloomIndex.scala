package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL BLOOM FILTERS: a per-file membership sketch over a
  * high-cardinality key column, and point/IN reads that prune at the
  * FILE-LISTING level against it. The equality-predicate complement of
  * [[ZoneMap]]: zone maps prune RANGE predicates but only on a
  * range-clustered layout — on a hash-scattered layout every file's
  * [min, max] envelope straddles any probe key and nothing prunes.
  * Blooms prune EQUALITY probes on ANY layout, because membership is a
  * content property, not a layout property. Delta keeps the same sketch
  * class in its file-skipping metadata; parquet-mr keeps one per
  * row-group (consulted only after the file is opened — this index
  * skips the open).
  *
  * Hashing: Kirsch–Mitzenmacher double hashing — k probe positions
  * `(h1 + i*h2) mod m` from two xxhash64 draws with distinct salts.
  * Both the build side and the lookup side evaluate the SAME Catalyst
  * expression ([[probePositions]]), so build/probe agreement is by
  * construction, not by a re-implementation that could drift.
  *
  * Guarantee: NO FALSE NEGATIVES — a file containing the probe key is
  * always listed (asserted in BloomIndexSpec against the brute-force
  * read). False positives cost one wasted file open, bounded by
  * (1 - e^(-k*n/m))^k per file (~4e-4 at n=8k keys, m=128Ki bits, k=7).
  *
  * Scale shape: the build is ONE scan with a map-side-partial
  * `collect_set` per file (sets bounded by m bits, exchange carries
  * ≤ |files| * m-bit sets); membership filtering runs DISTRIBUTED over
  * the index (the probe's k positions are literals folded into an
  * `array_contains` conjunction), and only the SURVIVING file names —
  * small by construction for point probes — reach the driver for the
  * read-path listing. The driver never holds the bitsets. */
object BloomIndex {

  /** Bits per file (power of two). 128Ki bits = ≤16 KiB/file stored as
    * a distinct-position int array; sized for ~10k keys/file at <1e-3
    * false-positive rate. Files packing far more keys than m/10 degrade
    * toward keep-everything — never toward wrong answers. */
  val MBits = 131072
  /** Probes per key. */
  val K = 7

  /** The k probe bit positions of `key` as an int array column.
    * xxhash64 of a NULL child degenerates to hashing the salt alone, so
    * all-null key files collapse to one constant pattern; NULL probes
    * are rejected in [[prunedPointRead]] (`x = NULL` selects nothing). */
  def probePositions(key: Column): Column = {
    // reduce mod m BEFORE the multiply-add: identical mod-m arithmetic,
    // but operands stay < K*MBits so ANSI mode can never see an overflow
    val h1 = pmod(xxhash64(key, lit("graft-bloom-h1")), lit(MBits.toLong))
    val h2 = pmod(xxhash64(key, lit("graft-bloom-h2")), lit(MBits.toLong))
    transform(sequence(lit(0), lit(K - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(MBits.toLong)).cast("int"))
  }

  /** One (file, bits, n, key_type) row per parquet file under `path`:
    * `bits` is the sorted distinct probe-position set of every key in
    * the file, `n` the row count, `key_type` the key column's DataType
    * in DDL form. xxhash64 is TYPE-SENSITIVE (an IntegerType 7 and a
    * LongType 7 hash differently), so the probe side must hash the
    * probe value AS the build-side type — recording it in the index
    * makes that cast automatic and makes a non-castable probe fail
    * loud instead of silently missing files. Append-only layouts only
    * ever ADD rows here — see [[appendEpochIndex]] for the per-epoch
    * form. */
  def buildIndex(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    val data = spark.read.parquet(path)
    val keyType = data.schema(keyCol).dataType
    data
      .select(input_file_name().as("file"),
        explode(probePositions(col(keyCol))).as("bit"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("bit"))).as("bits"),
        // every row explodes to exactly K elements (duplicate VALUES
        // within one key's probe array still yield K exploded rows)
        (count(lit(1)) / K).cast("long").as("n"))
      .withColumn("key_type", lit(keyType.sql))
  }

  /** INCREMENTAL index maintenance for a [[graft.sources
    * .TransactionalLake]]-backed table — the bloom twin of
    * [[ZoneMap.appendEpochStats]]: per committed data epoch the index
    * rows are computed from THAT EPOCH'S files alone (O(batch), never
    * O(lake)) and committed to an index lake under the SAME epoch id,
    * inheriting the data lake's idempotent-replay contract.
    *
    * Fold interaction (same contract [[ZoneMap.appendEpochStats]]
    * documents): a retention fold (`TransactionalLake
    * .foldCommittedEpochs`) rewrites live epochs into `data_folded/
    * gen=*` and DELETES the originals — index rows for folded epochs
    * then point at dead files, and a later [[prunedInRead]] fails AT
    * READ TIME (loud, never a silent wrong answer: pruning only ever
    * narrows the listing, so a stale row can only name a missing file,
    * not hide a live one). After a fold, run [[refoldIndex]] and read
    * through [[indexFoldAware]] — the bloom twins of
    * [[ZoneMap.refoldStats]]/[[ZoneMap.statsIndexFoldAware]]. */
  def appendEpochIndex(spark: SparkSession, lakeRoot: String,
                       indexRoot: String, epoch: Long, keyCol: String): Unit = {
    val idx = buildIndex(spark, s"$lakeRoot/data/epoch=$epoch", keyCol)
    graft.sources.TransactionalLake.commitEpoch(idx, indexRoot, epoch,
      partitionCols = Nil)
  }

  /** The accumulated per-file index across all committed maintenance
    * epochs (bookkeeping epoch column dropped — consumers key on file). */
  def index(spark: SparkSession, indexRoot: String): DataFrame =
    graft.sources.TransactionalLake.readCommitted(spark, indexRoot)
      .drop("epoch")

  /** FOLD-AWARE index maintenance — the bloom twin of
    * [[ZoneMap.refoldStats]]: a retention fold rewrites aged epochs
    * into a generation dir and deletes their files, staling every index
    * row keyed on those paths. This hook re-INDEXES exactly the
    * generations that lack one. Unlike zone-map stats there is no
    * merge shortcut — folding rewrites FILE BOUNDARIES and per-file
    * membership must be recomputed from the new files' contents — but
    * the cost bound is the same O(fresh) one scan per new generation
    * the fold itself already paid. Idempotent via the generation dir's
    * _SUCCESS marker; absorbed generations' index dirs are dropped.
    * Returns the number of generations indexed this call. */
  def refoldIndex(spark: SparkSession, lakeRoot: String, indexRoot: String,
                  keyCol: String): Int = {
    val T = graft.sources.TransactionalLake
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexRoot), spark.sparkContext.hadoopConfiguration)
    val gens = T.foldView(spark, lakeRoot).map(_._2).getOrElse(Seq.empty)
      .filter(_._2.nonEmpty).map(_._1)
    var indexed = 0
    gens.foreach { g =>
      val out = s"$indexRoot/gen/v=$g"
      if (!fsys.exists(new org.apache.hadoop.fs.Path(s"$out/_SUCCESS"))) {
        buildIndex(spark, T.foldGenDataDir(lakeRoot, g), keyCol)
          .write.mode("overwrite").parquet(out)
        indexed += 1
      }
    }
    val genRoot = new org.apache.hadoop.fs.Path(s"$indexRoot/gen")
    if (fsys.exists(genRoot)) {
      val live = gens.map(g => s"v=$g").toSet
      fsys.listStatus(genRoot).map(_.getPath)
        .filter(p => p.getName.startsWith("v=") && !live.contains(p.getName))
        .foreach(p => fsys.delete(p, true))
    }
    indexed
  }

  /** OFFBOARDING CASCADE for the bloom index — the bloom twin of
    * [[ZoneMap.purgeTenantStats]]: drop every index row whose indexed
    * file lives under the purged tenant's partition subtree (committed
    * index epochs via [[graft.sources.TransactionalLake
    * .purgeRowsWhere]], refold generations via `purgeRowsInDir`). Run
    * AFTER the data lake's `purgeTenant`; metadata-scale. */
  def purgeTenantRows(spark: SparkSession, indexRoot: String,
                      tenant: String): Int = {
    val T = graft.sources.TransactionalLake
    val pred = col("file").contains(s"/tenant=$tenant/")
    var n = T.purgeRowsWhere(spark, indexRoot, pred)
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexRoot), spark.sparkContext.hadoopConfiguration)
    val genRoot = new org.apache.hadoop.fs.Path(s"$indexRoot/gen")
    if (fsys.exists(genRoot))
      fsys.listStatus(genRoot).map(_.getPath)
        .filter(_.getName.startsWith("v=")).foreach { p =>
          if (T.purgeRowsInDir(spark, p.toString, pred)) n += 1
        }
    n
  }

  /** The bloom index of a lake that has been through retention folds:
    * per-epoch rows for LIVE epochs plus the per-generation index
    * [[refoldIndex]] maintains. Fails loud if a fold happened but its
    * generation was never re-indexed — a silently stale index is the
    * failure mode this layer exists to prevent. */
  def indexFoldAware(spark: SparkSession, lakeRoot: String,
                     indexRoot: String): DataFrame = {
    val T = graft.sources.TransactionalLake
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexRoot), spark.sparkContext.hadoopConfiguration)
    val foldedIds = T.foldState(spark, lakeRoot).map(_._2)
      .getOrElse(Seq.empty).toSet
    val liveEpochIndex = T.readCommitted(spark, indexRoot)
      .filter(!col("epoch").cast("long")
        .isin(foldedIds.toSeq.map(Long.box): _*))
      .drop("epoch")
    val gens = T.foldView(spark, lakeRoot).map(_._2).getOrElse(Seq.empty)
      .filter(_._2.nonEmpty).map(_._1)
    val genDirs = gens.map { g =>
      val d = s"$indexRoot/gen/v=$g"
      require(fsys.exists(new org.apache.hadoop.fs.Path(s"$d/_SUCCESS")),
        s"bloom index missing for fold generation $g of $lakeRoot — " +
          "run BloomIndex.refoldIndex after every foldCommittedEpochs")
      d
    }
    if (genDirs.isEmpty) liveEpochIndex
    // allowMissingColumns: live epochs indexed BEFORE the key_type column
    // existed carry a narrower schema; the legacy rows surface with a
    // NULL key_type (the untyped case indexKeyType already handles)
    // instead of the union throwing a column-mismatch error
    else liveEpochIndex.unionByName(spark.read.parquet(genDirs: _*),
      allowMissingColumns = true)
  }

  /** Files that MAY contain any of `values`, resolved distributed: the
    * probe positions fold to literals, the conjunction runs as an
    * `array_contains` filter over the index, and only surviving file
    * names are collected. */
  /** The key DataType the index was built with, parsed from its
    * `key_type` column. A MIXED index (legacy NULL-key_type rows
    * unioned with typed rows, e.g. epochs indexed before the column
    * existed plus a post-fold generation) uses the one recorded type —
    * all rows were built from the same key column of the same lake, so
    * the legacy rows hashed that column's natural type, exactly what
    * the recorded DDL names — but WARNS, because that assumption is
    * trusted, not verified: a key-column type migration between the
    * legacy epoch and the typed one would false-negative silently. A
    * LEGACY-ONLY index (no key_type column, or every row NULL) RAISES:
    * "probes hash untyped and the caller owns type agreement" was the
    * silent-false-negative contract this index exists to forbid, and
    * every current writer stamps key_type — the only way to hold one
    * is a pre-key_type artifact, which a rebuild fixes. None is
    * returned ONLY for an index with zero rows, which candidateFiles'
    * empty-index guard rejects with its own message. */
  private def indexKeyType(index: DataFrame): Option[org.apache.spark.sql.types.DataType] = {
    val rebuildMsg =
      "bloom index predates the key_type column — untyped probes hash by " +
        "the probe VALUE's type, so a probe of a different type than the " +
        "build-side key column silently misses the owning files (a false " +
        "negative, the one failure class this index promises away); " +
        "rebuild the index with buildIndex/appendEpochIndex (they stamp " +
        "key_type) before planning point reads against it"
    if (!index.columns.contains("key_type"))
      throw new IllegalArgumentException(rebuildMsg)
    val types = index.select(col("key_type")).distinct().collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    val typed = types.filter(_ != null)
    if (types.isEmpty) None // zero rows: candidateFiles' guard owns this
    else if (typed.isEmpty) throw new IllegalArgumentException(rebuildMsg)
    else {
      require(typed.length == 1,
        s"bloom index mixes key types [${typed.mkString(", ")}] — it was " +
          "appended with different key columns; rebuild one index per key")
      if (types.contains(null))
        System.err.println("WARN BloomIndex: index mixes legacy (NULL " +
          s"key_type) rows with '${typed.head}' rows — probing both via " +
          "the recorded type ASSUMES the legacy epochs were built from " +
          "the same key column type; if the key column's type migrated " +
          "since, legacy files can false-negative. Re-index the legacy " +
          "epochs to verify rather than trust.")
      Some(org.apache.spark.sql.types.DataType.fromDDL(typed.head))
    }
  }

  private[graft] def candidateFiles(spark: SparkSession, index: DataFrame,
                                        values: Seq[Any]): (Array[String], Long) = {
    require(values.nonEmpty && values.forall(_ != null),
      "bloom probe values must be non-null and non-empty — an equality " +
        "predicate on NULL selects nothing; filter it out before planning")
    // xxhash64 is type-sensitive: cast every probe to the BUILD-side key
    // type before hashing (an Int 7 probed against a bigint-keyed index
    // would otherwise hash to different positions and silently miss the
    // owning files — a false negative, the one failure class this index
    // promises away). A probe that does not survive the cast fails loud.
    val keyType = indexKeyType(index)
    // try_cast, not cast: under ANSI mode a malformed cast THROWS a raw
    // CAST_INVALID_INPUT from inside the probe job — try_cast yields
    // NULL instead, which the explicit require below turns into the
    // index's own fail-loud message naming the probe and the key type
    def typed(v: Any): Column = keyType match {
      case Some(t) => lit(v).try_cast(t)
      case None => lit(v)
    }
    val idx = index.select(col("file"), col("bits")).cache()
    try {
      val total = idx.count()
      require(total > 0,
        "bloom index is empty — nothing has been indexed; run " +
          "buildIndex/appendEpochIndex before planning point reads against it")
      // fail-loud driver budget (same discipline as ZoneMap's planning
      // reads): per-file rows are bounded by the compaction invariant —
      // an over-budget index means fold/compact maintenance is overdue,
      // and the candidate collect below must refuse, not OOM the driver
      require(total <= ZoneMap.MaxPlannedFiles,
        s"bloom planning would consider $total per-file rows (> " +
          s"${ZoneMap.MaxPlannedFiles}) — the lake's compaction/fold " +
          "maintenance is overdue; compact before planning point reads " +
          "against this index")
      // all probe arrays (and cast-validity flags) in ONE local 1-row
      // job, not one per value. `lossy` round-trips the cast probe back
      // to the probe's own type: try_cast admits value-CHANGING casts
      // (7.5 → bigint 7) that a castability check alone misses — the
      // hash probe and the exact re-filter would then both match key 7
      // and return rows that do not equal the caller's probe. A probe
      // the key type cannot represent exactly must fail loud, same as
      // an uncastable one. (Null-safe <=>: the null case has its own
      // message above; a failed round-trip parse counts as lossy.)
      val probeRow = spark.range(1).select(values.zipWithIndex.flatMap {
        case (v, i) => Seq(probePositions(typed(v)).as(s"p$i"),
          typed(v).isNull.as(s"null$i"),
          (!(typed(v).try_cast(
            org.apache.spark.sql.catalyst.expressions.Literal(v).dataType)
            <=> lit(v))).as(s"lossy$i"))
      }: _*).head
      values.indices.foreach { i =>
        require(!probeRow.getBoolean(probeRow.fieldIndex(s"null$i")),
          s"bloom probe value '${values(i)}' (${values(i).getClass.getSimpleName}) " +
            s"is not castable to the index key type ${keyType.fold("?")(_.sql)} — " +
            "a mistyped probe would silently miss files; pass a value of the " +
            "key column's type")
        require(!probeRow.getBoolean(probeRow.fieldIndex(s"lossy$i")),
          s"bloom probe value '${values(i)}' (${values(i).getClass.getSimpleName}) " +
            s"does not survive the cast to the index key type " +
            s"${keyType.fold("?")(_.sql)} round-trip — the cast changes the " +
            "value, so the read would return rows that do not equal the " +
            "probe; pass a value the key column's type represents exactly")
      }
      val anyValue = values.indices.map { i =>
        probeRow.getSeq[Int](probeRow.fieldIndex(s"p$i")).distinct
          .map(p => array_contains(col("bits"), p)).reduce(_ && _)
      }.reduce(_ || _)
      (idx.filter(anyValue).select(col("file")).collect().map(_.getString(0)),
        total)
    } finally idx.unpersist()
  }

  /** Point read `keyCol = value` planned against the index: only files
    * whose bloom admits the probe are LISTED, then the exact predicate
    * re-filters inside them (blooms prune membership, they never answer
    * predicates — a false positive costs a file open, never a wrong
    * row). `requirePruned` fails loud if nothing pruned — on a point
    * probe that means the index is saturated (files pack >> m/10 keys)
    * and needs a bigger m or smaller files. */
  def prunedPointRead(spark: SparkSession, index: DataFrame, keyCol: String,
                      value: Any, requirePruned: Boolean = false): DataFrame =
    prunedInRead(spark, index, keyCol, Seq(value), requirePruned)

  /** IN-list read: files admitting ANY probe survive, then the exact
    * `isin` re-filters. */
  def prunedInRead(spark: SparkSession, index: DataFrame, keyCol: String,
                   values: Seq[Any], requirePruned: Boolean = false): DataFrame = {
    val (keep, total) = candidateFiles(spark, index, values)
    if (requirePruned)
      require(keep.length < total,
        s"bloom pruning eliminated nothing ($total files all admit the " +
          s"probe set) — the index is saturated for '$keyCol'; raise MBits " +
          "or write smaller files")
    if (keep.isEmpty)
      // provably no file contains any probe (no-false-negative guarantee)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(FileListing.readablePath(
          index.select(col("file")).head.getString(0))).schema)
    else
      spark.read.parquet(keep.toSeq.map(FileListing.readablePath): _*)
        .filter(exactInPredicate(index, keyCol, values))
  }

  /** The exact IN re-filter with probes cast to the indexed key type —
    * the same type discipline the hash probe uses (isin's implicit
    * coercion covers the common cases but not, e.g., a string probe
    * against a numeric key). Shared with [[ComposedScan]]. */
  private[operators] def exactInPredicate(index: DataFrame, keyCol: String,
                                          values: Seq[Any]): Column =
    indexKeyType(index) match {
      case Some(t) => values.map(v => col(keyCol) === lit(v).cast(t))
        .reduce(_ || _)
      case None => col(keyCol).isin(values: _*)
    }
}
