package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache discipline for operators whose internals feed multiple consumers
  * (LSH shingle tables, cluster assignments, tf tables): the session's
  * `CacheManager` holds every `Dataset.persist` STRONGLY until
  * `unpersist()` — caches are NOT freed when the plan is GC'd, so a
  * long-lived session (streaming service, notebook, repeated pipeline
  * runs) would accumulate them without bound.
  *
  * [[scoped]] is the discipline: intermediates live exactly as long as it
  * takes to materialize the operator's (much smaller) result, and the
  * result itself is returned as a persisted handle the CALLER owns and
  * unpersists when done.
  */
private[graft] object Caching {

  /** Plan-audit escape hatch (graft.Explain): when set, [[scoped]] builds
    * the result plan with NO caching or materialization, so explain shows
    * the operator's REAL plan (pushed filters, broadcast joins, codegen
    * spans) instead of an InMemoryTableScan over an eagerly-built cache —
    * and the audit tool never executes the operator it is only printing. */
  @volatile var planOnly: Boolean = false

  /** Persist `df` at MEMORY_AND_DISK unless some equivalent plan is
    * already cached (re-persisting an already-cached plan is a no-op that
    * logs a CacheManager warning — e.g. the brute-force Jaccard baseline
    * and the LSH path building the identical shingle projection in one
    * session). Returns whether THIS call took ownership (i.e. the caller
    * should be the one to unpersist). */
  def cacheIfNeeded(df: DataFrame): Boolean = {
    val owned = df.storageLevel == StorageLevel.NONE
    if (owned) df.persist(StorageLevel.MEMORY_AND_DISK)
    owned
  }

  /** Run a multi-consumer operator body with bounded cache lifetime:
    * persist each intermediate, EAGERLY materialize `result` (itself
    * persisted — one extra pass over the small output, nothing more: the
    * consuming action replays the cache), then release the intermediates.
    *
    * `persist`, not `localCheckpoint`: lineage survives, so a lost
    * executor — routine at 1000 executors — recomputes instead of killing
    * the job; after the intermediates are released a recompute re-runs
    * their subtree uncached (slower, still correct).
    *
    * The returned frame is cached and already materialized; callers that
    * run in a long-lived session should `.unpersist()` it when done with
    * it — that single small handle is the only cache that outlives the
    * operator. */
  def scoped(intermediates: DataFrame*)(result: => DataFrame): DataFrame = {
    if (planOnly) return result
    val (out, release) = scopedDeferred(intermediates: _*)(result)
    try { out.count(); out } finally release()
  }

  /** [[scoped]] WITHOUT the eager materialization — for callers that
    * perform EXACTLY ONE materializing action on the returned frame
    * (an eager checkpoint, a single write) and would otherwise pay the
    * `count()` as a second full pass over the operator.
    *
    * Contract: the returned frame IS persisted (its plan reads the
    * intermediates multiple times — e.g. both sides of a self-join —
    * so the caller's one action must populate a cache, not recompute
    * the subtree per consumer); the caller runs its action, THEN calls
    * `release()` (dropping the intermediates — releasing before the
    * action would make it recompute them uncached, once per consumer),
    * and finally unpersists the returned frame when done with it.
    * `release()` is idempotent and must also run on the failure path. */
  def scopedDeferred(intermediates: DataFrame*)(result: => DataFrame): (DataFrame, () => Unit) = {
    if (planOnly) return (result, () => ())
    // by-name result: intermediates are cached BEFORE the body builds (or
    // probes — see benchmarkOverlap's broadcast gate) the result plan
    val owned = intermediates.filter(cacheIfNeeded)
    try (result.persist(StorageLevel.MEMORY_AND_DISK),
      () => owned.foreach(_.unpersist(blocking = false)))
    catch { case e: Throwable =>
      owned.foreach(_.unpersist(blocking = false)); throw e
    }
  }
}
