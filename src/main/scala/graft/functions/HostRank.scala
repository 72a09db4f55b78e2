package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph PageRank — the web-reputation signal CommonCrawl-derived
  * pipelines (CCNet-class curation) use to rank hosts before quality
  * filtering. A link graph over hosts is tiny relative to the corpus (one
  * node per host, one edge per observed link), so the rank table is the
  * cheap side of every join here even at 100 TB of documents.
  *
  * Integer-exact by construction (the DSIR micro-unit convention): ranks
  * live in micro-units (1.0 == 1,000,000) as BIGINT; each edge carries
  * `rank div outdeg` and the damped update is
  * `(1000-d)*1000 + (d * inflow) div 1000` with d in permille — every
  * operation is integral division/multiplication/summation, so the result
  * is order-independent and bit-replayable in any engine (no fp summation
  * hazards). Documented deviations from textbook PageRank: dangling-node
  * mass is dropped (not redistributed) and `div` flooring loses <1 micro
  * per edge — both standard simplifications; the relative ORDER of hosts,
  * which is what curation consumes, is unaffected at any realistic scale.
  *
  * Multigraph semantics: `outdeg` counts edge ROWS, and every edge row
  * carries one contribution — a host linking twice sends twice the mass.
  * Pre-`distinct` the edges for simple-graph semantics.
  *
  * 100 TB posture: per iteration one shuffle on src (rank→edge join) and
  * one on dst (inflow aggregate, map-side combinable) — both keyed by
  * host, never by document; no driver-side data, no broadcast of anything
  * node-cardinality-sized. Long chains (a 100 TB web graph wants 20-50
  * rounds) stay plan-bounded: `ranks` is checkpointed every
  * `checkpointEvery` iterations (eager localCheckpoint — the
  * connectedComponents lineage-truncation pattern; swap for reliable
  * `checkpoint` against a checkpoint dir when executor loss must be
  * survivable), so the logical plan never holds more than
  * `checkpointEvery` unrolled iterations. Values are unaffected — a
  * checkpoint is a materialization barrier, and every update is
  * integer-exact regardless of where the barrier lands.
  *
  * Cache lifecycle: the edge/node caches this computation needs are
  * unpersisted before returning; the RETURNED frame is persisted and
  * materialized (host-cardinality-sized — tiny next to the corpus) and
  * the caller owns its lifecycle (`.unpersist()` when done).
  */
object HostRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPermille: Int = 850,
      rankCol: String = "rank_micro", checkpointEvery: Int = 5): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iters, dampingPermille, rankCol,
      checkpointEvery, earlyStop = false)._1

  /** [[pageRank]] with a CONVERGENCE stop: because ranks are integer-exact
    * and the update is a deterministic function of the previous ranks, a
    * fixpoint (no rank changed since the last checkpoint boundary) is
    * permanent — every later iteration reproduces the same table — so
    * stopping there returns EXACTLY the fixed-iters result for any larger
    * `maxIters` (unit-proven; no fp-tolerance semantics to document). The
    * probe is one count-of-changed-rows aggregate per checkpoint boundary
    * (host-cardinality-sized, integer equality), which is why the check
    * rides the boundaries rather than every iteration: a 100 TB web graph
    * wants the 20-50 iteration budget but often converges sooner, and each
    * saved iteration is two corpus-of-hosts shuffles. Returns the ranks
    * and the number of iterations actually run. */
  def pageRankConverged(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int, dampingPermille: Int = 850,
      rankCol: String = "rank_micro",
      checkpointEvery: Int = 5): (DataFrame, Int) =
    pageRankImpl(edges, srcCol, dstCol, maxIters, dampingPermille, rankCol,
      checkpointEvery, earlyStop = true)

  private def pageRankImpl(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPermille: Int, rankCol: String,
      checkpointEvery: Int, earlyStop: Boolean): (DataFrame, Int) = {
    require(iters >= 1 && iters <= 50, "pageRank: iters in [1,50]")
    require(checkpointEvery >= 1, "pageRank: checkpointEvery must be >= 1")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      "pageRank: dampingPermille in [0,1000]")
    // a null endpoint is not a host: the edge carries no usable link.
    // persist: every iteration references e (and nodes/outdeg derived from
    // it) — without the barrier the caller's arbitrary edge lineage is
    // re-scanned once per iteration (only identical exchanges get reuse).
    // Both caches are explicitly unpersisted below once `out` is
    // materialized (ContextCleaner does NOT reap Dataset-level caches).
    val e = edges.select(col(srcCol).cast("string").as("__pr_src"),
      col(dstCol).cast("string").as("__pr_dst"))
      .where(col("__pr_src").isNotNull && col("__pr_dst").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("__pr_src").as("node"))
      .union(e.select(col("__pr_dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("__pr_src").agg(count(lit(1)).as("__pr_outdeg"))
    val base = (1000L - dampingPermille) * 1000L
    // one damped-update step — THE update, shared by the iteration loop and
    // the convergence probe so the two can never drift
    def step(cur: DataFrame): DataFrame = {
      val contrib = e
        .join(cur.withColumnRenamed("node", "__pr_src"), "__pr_src")
        .join(outdeg, "__pr_src")
        .select(col("__pr_dst").as("node"),
          expr(s"$rankCol div __pr_outdeg").as("__pr_contrib"))
      val inflow = contrib.groupBy("node")
        .agg(sum("__pr_contrib").as("__pr_inflow"))
      nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), (lit(base) +
          expr(s"($dampingPermille * coalesce(__pr_inflow, cast(0 as bigint))) div 1000"))
          .as(rankCol))
    }
    var ranks = nodes.withColumn(rankCol, lit(1000000L))
    var itersRun = iters
    var i = 1
    var done = false
    // the convergence probe's computed step is ADOPTED as the next
    // iteration when it does not converge, so probing costs ~nothing
    // beyond the checkpoint it produces (the step would have run anyway)
    var probedNext: DataFrame = null
    while (i <= iters && !done) {
      ranks = if (probedNext != null) { val r = probedNext; probedNext = null; r }
              else step(ranks)
      // lineage barrier: without it iteration i's plan embeds all i-1
      // predecessors (optimizer time grows superlinearly, executors re-plan
      // a monster). Eager: the truncation must happen NOW, not when some
      // later action forces a 40-iteration plan anyway.
      if (i % checkpointEvery == 0 && i < iters) {
        ranks = ranks.localCheckpoint(true)
        if (earlyStop) {
          // TRUE integer-fixpoint probe against the checkpointed boundary:
          // does ONE more step reproduce the table exactly? (A weaker
          // boundary-vs-boundary equality would also accept a limit cycle
          // whose period divides checkpointEvery — then stopping early
          // would NOT equal the fixed-iters run.) The probed step is
          // checkpointed so the equality join reads materialized blocks,
          // and on non-convergence it IS iteration i+1 (adopted above).
          val next = step(ranks).localCheckpoint(true)
          val converged = next
            .withColumnRenamed(rankCol, "__pr_next")
            .join(ranks, "node")
            .where(col("__pr_next") =!= col(rankCol))
            .isEmpty
          if (converged) { itersRun = i; done = true }
          else probedNext = next
        }
      }
      i += 1
    }
    val out = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize so the caches below are safe to drop
    e.unpersist(false)
    nodes.unpersist(false)
    (out, itersRun)
  }
}
