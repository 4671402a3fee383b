package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Tenant-scoped DERIVED-ARTIFACT roots + the offboarding cascade.
  *
  * The engine's derived indexes — substring gram/df postings
  * ([[graft.operators.Dedup.commitSubstringBatch]]), BM25/text postings
  * ([[graft.operators.TextIndex]]), streaming ANN generations
  * ([[graft.streaming.StreamingSimilarity]]) — all retain content
  * derived from document text. In a multi-tenant deployment a tenant
  * purge that scrubs only the event/document lake
  * ([[Lake.purgeTenant]] / [[TransactionalLake.purgeTenant]]) therefore
  * leaves tenant-derived n-grams, postings, and codes behind — a real
  * offboarding (the whole reason the reference partitions its lake by
  * tenant: `kinesis-stack.ts:137` drives deletion by tenant prefix)
  * must cascade here too.
  *
  * The design answer is PER-TENANT ROOTS, not row-level scrubbing:
  * cross-tenant derived state (a dedup pair spanning two tenants, a df
  * count mixing tenants' text) would violate the engine's tenant
  * isolation invariant anyway (see `TenantQueries` — tenants never see
  * each other's rows), so every text-derived index is maintained under
  * `base/tenant=<t>/...`. That makes "post-purge index ≡ an index
  * built on a corpus that never had the tenant" hold EXACTLY (the
  * surviving tenants' roots are bit-identical — nothing they contain
  * ever depended on the purged tenant) and makes the purge itself
  * O(tenant data), never O(corpus). Shared per-FILE artifacts over a
  * tenant-partitioned lake (zone maps, bloom indexes) cascade by
  * row-level rewrite instead — see
  * [[TransactionalLake.purgeRowsWhere]].
  *
  * Purge protocol (idempotent, crash-safe, replay-stable):
  *  1. Tombstone `base/_purged/<tenant>` FIRST — from this instant the
  *     tenant reads as purged ([[isPurged]]) even if a crash interrupts
  *     the scrub; a re-run completes it.
  *  2. Every transactional sub-root under the tenant dir (any dir with
  *     a `_manifest` child) has its `data`/`data_folded` subtrees
  *     deleted while its COMMIT MARKERS are KEPT: a crash-replayed
  *     committed epoch stays a no-op ([[TransactionalLake.isCommitted]]
  *     still true), so the purged tenant cannot resurrect from replay —
  *     the same property [[TransactionalLake.purgeTenant]] pins for the
  *     lake itself. NEW epochs for an offboarded tenant are an
  *     ingest-control matter: the tombstone is the signal upstream
  *     routing must consult (same contract as `Lake`'s `_purged/`).
  *  3. Everything else under the tenant dir (plain parquet artifacts,
  *     keyed-view state, centroid generations) is deleted outright —
  *     those layouts rebuild from their (already-purged) sources and
  *     have no replay-commit protocol to preserve.
  * Readers must check [[isPurged]] before reading a tenant's root — a
  * scrubbed root's manifest lists epochs whose data dirs are gone, so
  * an unguarded read fails loud (missing path), never silently wrong.
  */
object TenantArtifacts {

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  def tenantRoot(base: String, tenant: String): String =
    s"$base/tenant=$tenant"

  private def tombstone(base: String, tenant: String) =
    new Path(s"$base/_purged/$tenant")

  /** True iff `tenant` has been offboarded from this artifact base. */
  def isPurged(spark: SparkSession, base: String, tenant: String): Boolean =
    fs(spark, base).exists(tombstone(base, tenant))

  /** Live (non-purged) tenants with a root under `base`. */
  def tenants(spark: SparkSession, base: String): Seq[String] = {
    val f = fs(spark, base)
    val p = new Path(base)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("tenant="))
      .map(_.stripPrefix("tenant="))
      .filterNot(isPurged(spark, base, _))
      .sorted.toSeq
  }

  /** Offboard `tenant` from the derived-artifact family under `base`
    * (protocol in the object scaladoc). Returns the number of data
    * subtrees removed; idempotent — a replay (or crash re-run) returns
    * having nothing left to delete. */
  def purgeTenant(spark: SparkSession, base: String, tenant: String): Int = {
    val f = fs(spark, base)
    // tombstone first: a crash after this point leaves the tenant
    // VISIBLY purged and the re-run completes the scrub
    f.mkdirs(new Path(s"$base/_purged"))
    val t = tombstone(base, tenant)
    if (!f.exists(t)) f.create(t, true).close()
    val troot = new Path(tenantRoot(base, tenant))
    if (!f.exists(troot)) return 0
    var removed = 0
    // returns true iff commit markers were KEPT somewhere under `dir`
    def scrub(dir: Path): Boolean = {
      if (f.exists(new Path(dir, "_manifest"))) {
        // transactional sub-root: drop the data, KEEP the commit
        // markers (replayed committed epochs must stay no-ops)
        Seq("data", "data_folded").foreach { d =>
          if (f.delete(new Path(dir, d), true)) removed += 1
        }
        true
      } else {
        var kept = false
        f.listStatus(dir).foreach { st =>
          if (st.isDirectory) {
            if (scrub(st.getPath)) kept = true
            else if (f.delete(st.getPath, true)) removed += 1
          } else { f.delete(st.getPath, false); () }
        }
        kept
      }
    }
    if (!scrub(troot)) { f.delete(troot, true); () }
    removed
  }
}
