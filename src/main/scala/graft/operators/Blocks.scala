package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Block-manager hygiene for iterative operators.
  *
  * The iterative operators (connected components, the incremental dedup
  * fold, Lloyd refinement) need per-round lineage truncation —
  * `localCheckpoint(true)` — or the self-referencing plans double every
  * round. But an EAGER local checkpoint materializes into executor
  * block-manager storage, and `Dataset.unpersist` cannot free it (the
  * blocks live on the RDD, outside the cache manager). A returned frame
  * backed by those blocks therefore pins storage memory for as long as
  * any caller might read it — in a long-lived session running repeated
  * dedup passes, monotone executor storage growth.
  *
  * The contract here: intermediates use local checkpoints and are freed
  * with [[release]] as soon as the next round exists; the FINAL result of
  * an iterative operator is copied OUT of the block manager with
  * [[copyOut]] — a reliable (disk-file) checkpoint — after which every
  * round's blocks can be released. Operators then return frames that hold
  * ZERO block-manager storage (`sc.getPersistentRDDs` is empty afterward
  * — pinned by BlockRetentionSpec), and survive an external
  * unpersist-all sweep (e.g. the bench quiesce barrier).
  *
  * Scale note: the copied-out artifacts are the SMALL end products of
  * each loop (dup-cluster labels, candidate shingle sets, centroid sets,
  * band indexes) — never the corpus. On a cluster, point
  * `sc.setCheckpointDir` at shared storage (HDFS/S3); the tmp-dir
  * fallback below serves single-node sessions and is removed at JVM
  * exit.
  */
object Blocks {

  /** Reliable checkpoint dir, configured once per session if the caller
    * has not set one. Colocated with `spark.local.dir` when that is
    * configured: the copied-out artifacts are read-after-write scratch
    * with the same lifetime as shuffle files, and splitting them onto a
    * different device class (e.g. tmpfs shuffle + disk checkpoints)
    * makes the checkpoint write absorb the slow device's writeback
    * stalls — measured as the 1.5-2x run-to-run spread on the
    * checkpoint-heavy iterative entries. On a cluster, callers set
    * `sc.setCheckpointDir` to shared storage (HDFS/S3) and this fallback
    * never engages. */
  /** Synchronized: copyOut is called from concurrent driver threads (the
    * §2.6 overlap pools in the fixture/fold entries), and the
    * check-then-act on the session-global `setCheckpointDir` would
    * otherwise race — benign in outcome (last set wins, all dirs exist)
    * but a session-global mutation from concurrent threads (r16 ADVICE).
    * One winner now creates the dir; every later caller sees it set. */
  private def ensureCheckpointDir(spark: SparkSession): Unit = this.synchronized {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      // SPARK_LOCAL_DIRS is the deployment-env spelling of the same
      // scratch location (cluster managers set it); without the fallback
      // those deployments silently land on java.io.tmpdir and reintroduce
      // the cross-device variance this colocation removes
      val base = spark.sparkContext.getConf.getOption("spark.local.dir")
        .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
        .map(_.split(",").head.trim).filter(_.nonEmpty)
        .map { d =>
          val p = java.nio.file.Paths.get(d)
          java.nio.file.Files.createDirectories(p); p
        }
      val dir = base match {
        case Some(p) => java.nio.file.Files.createTempDirectory(p, "graft-ckpt")
        case None => java.nio.file.Files.createTempDirectory("graft-ckpt")
      }
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(p: java.io.File): Unit = {
          Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
        }
        rm(dir.toFile)
      }))
      spark.sparkContext.setCheckpointDir(dir.toString)
    }
  }

  /** Copy an eagerly-computed intermediate OUT of the block manager:
    * reliable (disk-backed) checkpoint, lineage truncated. The returned
    * frame reads files, not block-manager blocks, so the source local
    * checkpoint can be [[release]]d immediately and an unpersist-all
    * sweep cannot invalidate the result.
    *
    * `checkpoint(eager)` evaluates the plan TWICE (the materializing
    * action, then the checkpoint job recomputing from lineage — Spark's
    * documented persist-before-checkpoint hazard). Whether that matters
    * depends on the caller:
    *  - the iterative operators copy out of loop state that is already
    *    localCheckpoint-backed, so the "recompute" just re-reads blocks
    *    — the default plain checkpoint is CHEAPER there (an extra
    *    persist pass measurably slowed every dedup loop ~15%);
    *  - a FRESH expensive lineage (e.g. the flagship pipeline's
    *    filtered-corpus stage) genuinely runs twice — `singleEval=true`
    *    local-checkpoints into blocks first, writes the reliable files
    *    from the blocks, and releases them (measured 2.3× on the
    *    flagship v2 stage). Lost-block risk between the two steps fails
    *    the job rather than recomputing — small end products only. */
  def copyOut(df: DataFrame, singleEval: Boolean = false): DataFrame = {
    ensureCheckpointDir(df.sparkSession)
    if (!singleEval) df.checkpoint(eager = true)
    else {
      val local = df.localCheckpoint(eager = true)
      try local.checkpoint(eager = true)
      finally release(local)
    }
  }

  /** Free a localCheckpointed frame's blocks. `Dataset.unpersist` is a
    * no-op for these (blocks were persisted on the RDD directly, outside
    * the cache manager) — reach through to the underlying RDD. Falls back
    * to a normal unpersist for cache-manager frames. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false); ()
      case _ => df.unpersist(); ()
    }

  // ---- thread-confined release scopes ----------------------------------
  // An operator that local-checkpoints intermediates DEEP inside its plan
  // builder (e.g. the PPJoin candidate generator's dfreq) needs those
  // blocks freed when the operator returns its copied-out result. The
  // earlier snapshot-diff sweep (diff sc.getPersistentRDDs before/after)
  // released every RDD persisted PROCESS-WIDE during the call — correct
  // only while dedup is driver-single-threaded; a concurrent
  // localCheckpoint (a streaming micro-batch, a parallel maintenance
  // thread) would be unrecoverably unpersisted mid-use. A scope is a
  // ThreadLocal register: only frames explicitly enrolled by code running
  // on THIS thread are released, concurrency-safe by construction.

  private val scopeReg =
    new ThreadLocal[java.util.ArrayDeque[
      scala.collection.mutable.ArrayBuffer[DataFrame]]] {
      override def initialValue() =
        new java.util.ArrayDeque[
          scala.collection.mutable.ArrayBuffer[DataFrame]]()
    }

  /** Run `body` with a release scope open on the current thread: every
    * frame [[scoped]] inside it is released (best-effort) when `body`
    * exits, on any path. Scopes nest; each releases only its own. */
  def scope[T](body: => T): T = {
    val stack = scopeReg.get()
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    stack.push(buf)
    try body
    finally {
      stack.pop()
      buf.foreach(f => try release(f) catch { case _: Throwable => () })
    }
  }

  /** Enroll an eagerly-materialized frame with the innermost open scope
    * on this thread (identity no-op when none is open — callers outside
    * a scope own release themselves) and return it.
    *
    * The no-scope case is LOGGED: every builder that enrolls a
    * checkpoint expects a [[scope]] around it, and a silent no-op here
    * leaks the checkpoint blocks permanently (the class of leak the old
    * process-wide snapshot-diff sweep used to catch). The one-line
    * stderr note makes a missing scope visible in the first local run
    * instead of as slow block-manager growth in production. */
  def scoped(df: DataFrame): DataFrame = {
    val stack = scopeReg.get()
    if (!stack.isEmpty) stack.peek() += df
    else System.err.println(
      "[blocks] WARN: Blocks.scoped called with no open scope on thread " +
        s"'${Thread.currentThread().getName}' - the enrolled frame will " +
        "NOT be auto-released; wrap the caller in Blocks.scope or release " +
        "it explicitly")
    df
  }
}
