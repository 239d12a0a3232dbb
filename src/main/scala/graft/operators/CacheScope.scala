package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Caller-owned lifetime for operator-internal caches.
 *
 * Several multi-pass operators (minhashPairs, duplicateSpans,
 * dedupLines, lmScore, tfIdfTopTerms, semanticDedup, kmeans) persist a
 * narrow intermediate so the expensive pass (tokenize/shingle/assign)
 * runs once instead of once per consumer. Those caches are
 * MEMORY_AND_DISK: memory blocks are evictable, but spilled disk blocks
 * live until `unpersist` or context shutdown — in a long-running
 * application that calls the operators repeatedly the disk blocks
 * accumulate.
 *
 * Pass a fresh `CacheScope()` to such an operator, materialize the
 * result (write/collect/count), then call [[unpersistAll]]:
 *
 * {{{
 *   val scope = CacheScope()
 *   val out = TextAnalysis.lmScore(docs, "id", "text", scope = scope)
 *   out.write.parquet(dst)        // materialize FIRST — the caches are
 *   scope.unpersistAll()          // inputs to the (lazy) result plan
 * }}}
 *
 * The default [[CacheScope.untracked]] keeps round-3 behavior: caches
 * persist for the session (fine for one-shot jobs like Verify/Bench,
 * where executor teardown reclaims everything).
 */
final class CacheScope private[operators] (track: Boolean) {
  private val dfs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (memory-and-disk) and remember it for release. */
  private[graft] def cache(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    if (track) synchronized { dfs += p }
    p
  }

  /** Release every intermediate this scope persisted. Safe to call more
    * than once; only call after the operator's result is materialized
    * (the caches are inputs to its lazy plan). */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    dfs.foreach(_.unpersist(blocking))
    dfs.clear()
  }
}

object CacheScope {
  /** A tracking scope the caller will `unpersistAll`. */
  def apply(): CacheScope = new CacheScope(true)

  /** Session-lifetime caches (the default): nothing to release until
    * context shutdown. */
  val untracked: CacheScope = new CacheScope(false)
}
