package graft.functions

import org.apache.spark.sql.DataFrame

/** The ONE materialization barrier for per-invocation intermediates.
  *
  * Why not a bare `Dataset.persist`: a Dataset-level persist registers the
  * plan in the session's CacheManager, which holds a STRONG reference until
  * an explicit `unpersist()` or session end — ContextCleaner never reaps
  * Dataset-level cache entries (it only unpersists RDD-level caches whose
  * RDD object is garbage-collected). A library function or query builder
  * that persists an intermediate it cannot later unpersist (the consuming
  * action happens after it returns) therefore leaks one cached copy per
  * DISTINCT materialized plan for the life of the process (identical
  * re-invocations dedupe inside CacheManager; evolving plans accumulate).
  *
  * [[materialize]] keeps the persist — an InMemoryRelation is a hard
  * materialization barrier (defeats CollapseProject re-inlining), its
  * columnar batches scan faster than row blocks, and CacheManager's
  * plan-level dedupe means a re-invoked query reuses the cache instead of
  * recomputing (measured: reverting this site class to eager
  * localCheckpoint cost ~4% of the whole bench — q_lm_bigram_score alone
  * 1.2 → 3.4 s) — and BOUNDS the lifecycle with a FIFO registry: at most
  * [[maxEntries]] barrier frames stay cached per process, oldest-first
  * eviction, and a NEW session's first call drops every other session's
  * entries (the pipeCache evictStale convention). The leak class is gone;
  * the cache behavior the operators were tuned against is unchanged.
  *
  * Failure note: cached blocks are recomputable from lineage (unlike a
  * localCheckpoint), so executor loss degrades to recompute, never failure.
  * Cached frames with an OWNED per-artifact lifecycle (the query registry's
  * pipeCache) manage their own persists and bypass this registry.
  */
object Caching {
  private val maxEntries = 128
  private val entries =
    scala.collection.mutable.Queue.empty[(Int, DataFrame)]

  private def drop(df: DataFrame): Unit =
    try df.unpersist(blocking = false) catch { case _: Throwable => () }

  def materialize(df: DataFrame): DataFrame = {
    val sid = System.identityHashCode(df.sparkSession)
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized {
      entries.dequeueAll(_._1 != sid).foreach(e => drop(e._2))
      entries.enqueue(sid -> p)
      while (entries.size > maxEntries) drop(entries.dequeue()._2)
    }
    p
  }
}
