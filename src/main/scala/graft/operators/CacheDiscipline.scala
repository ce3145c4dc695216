package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager materialize-then-release cache discipline (r21, VERDICT r20
  * item 4): an operator that persists a corpus-sized intermediate (an
  * exploded line/shingle/token table, a scored input chain) must not
  * leave that cache pinned after it returns — in a long-lived session
  * calling operators repeatedly on different inputs, each call would
  * otherwise pin a cache sized like an exploded corpus until memory or
  * disk pressure evicts it (guide §5's caching rule: unpersist when
  * done).
  *
  * The discipline — [[Graph]].hits' shape, factored out so every
  * operator-level persist follows it: persist the RESULT, force it with
  * one count (the single execution that fills every intermediate cache
  * and drains it into the result), then unpersist the intermediates
  * immediately. After the operator returns, the only cache entry left
  * is the result the caller is about to consume — bounded by the
  * operator's OUTPUT (runs, top-k, vocab pairs, gated rows), never by
  * the exploded working set. CacheLifecycleSpec pins the contract:
  * collecting any touched query leaves at most its result entries in
  * `spark.sharedState.cacheManager`, never a Generate-bearing
  * intermediate. */
private[operators] object CacheDiscipline {
  /** Measured cost of the discipline (OptLab `ablife`, interleaved
    * same-session A/B at sf0.1, best-of-4): 26–88 ms per affected leg
    * (~3–11%) — one extra action + the result cache write — against
    * unbounded cache residency without it. The `graft.ab.leak` sys-prop
    * (dev-only, read per call so the probe can alternate in-session)
    * restores the r20 leak behavior for exactly that A/B. */
  def materialized(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    if (sys.props.get("graft.ab.leak").contains("1")) return result // A/B probe
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }
}
