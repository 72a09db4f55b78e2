package graft.functions

import org.apache.spark.sql.DataFrame

/** The ONE materialization barrier for per-invocation intermediates.
  *
  * Why not `Dataset.persist`: a Dataset-level persist registers the plan in
  * the session's CacheManager, which holds a STRONG reference until an
  * explicit `unpersist()` or session end — ContextCleaner never reaps
  * Dataset-level cache entries (it only unpersists RDD-level caches whose
  * RDD object is garbage-collected). A library function or query builder
  * that persists an intermediate it cannot later unpersist (the consuming
  * action happens after it returns) therefore LEAKS one cached copy per
  * invocation in a long-lived process.
  *
  * `localCheckpoint(eager = true)` has the lifecycle such call sites need:
  * it executes the plan once, stores the row blocks at MEMORY_AND_DISK on
  * the RDD (registered with ContextCleaner), returns a Dataset rooted at a
  * LogicalRDD — a hard materialization barrier (defeats CollapseProject
  * re-inlining AND truncates lineage) — and the blocks are unpersisted
  * automatically when the returned plan becomes unreachable and is GC'd.
  *
  * Trade-offs, on purpose: the result is eager (the barrier's job runs at
  * call time, not first action), and local checkpoint blocks do not survive
  * executor loss — swap for reliable `checkpoint` against a checkpoint dir
  * when a 100 TB run must survive executor churn mid-query. Values are
  * unaffected either way: a barrier only fixes WHERE recomputation stops.
  *
  * Cached frames with an OWNED lifecycle (the query registry's pipeCache,
  * whose evictStale unpersists per session) correctly keep Dataset.persist.
  */
object Caching {
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
}
