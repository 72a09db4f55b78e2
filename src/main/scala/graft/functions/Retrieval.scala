package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — combining a lexical ranking (BM25) with a
  * semantic one (embedding ANN) is the standard retrieval stack for
  * RAG/eval-set construction over a pretraining corpus. Fusion is
  * reciprocal-rank (RRF, Cormack/Clarke/Buettcher 2009):
  * score(d) = Σ_lists 1/(k0 + rank_d(list)), k0 = 60 by convention —
  * rank-based, so the two engines' incomparable score scales never mix.
  *
  * Determinism: each contribution is ONE IEEE division from an integer
  * rank, and the sum is a fixed-arity expression (not an aggregation), so
  * the double replays bit-for-bit in any engine; ties break by id.
  *
  * 100 TB posture: fusion operates on the LISTS (top-N rows each, driver-
  * bounded by construction), never the corpus — the expensive sides are
  * the upstream rankers, which keep their own scale shapes (BM25's
  * filtered-term aggregation, ANN's bucketed candidate join). The final
  * cut is a TakeOrderedAndProject over ≤ Σ|lists| rows. */
object Retrieval {

  /** Fuse ranked lists by RRF. Each input holds (idCol, rankCol) with rank
    * 1-based; a doc absent from a list contributes 0 for that list. Output:
    * (idCol, r_1..r_n nullable per-list ranks, rrf) — the `topK` best by
    * (rrf DESC, id).
    *
    * CONTRACT (not validated — the lists are lazy): ids must be UNIQUE
    * within each list (a duplicate fans out through the chained full-outer
    * joins and emits duplicate fused rows) and ranks 1-based (a 0-based
    * rank silently contributes 1/k0). row_number-built lists hold both by
    * construction. */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
      topK: Int, k0: Int = 60, weights: Seq[Double] = Nil): DataFrame = {
    require(lists.nonEmpty, "Retrieval.rrf: need at least one list")
    require(k0 >= 1, "Retrieval.rrf: k0 must be >= 1")
    require(topK >= 0, "Retrieval.rrf: topK must be >= 0")
    // WEIGHTED RRF (the standard per-ranker-confidence extension:
    // score = Σ w_i/(k0 + rank_i)): each contribution stays a single IEEE
    // division — w_i/(k0+r) is one rounded op, so the fused double is still
    // bit-replayable in any engine. Empty = unweighted (all 1.0).
    require(weights.isEmpty || weights.size == lists.size,
      s"Retrieval.rrf: ${weights.size} weights for ${lists.size} lists")
    val w = if (weights.isEmpty) Seq.fill(lists.size)(1.0) else weights
    val renamed = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"r_${i + 1}"))
    }
    val joined = renamed.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = (1 to lists.size).map { i =>
      when(col(s"r_$i").isNotNull,
        lit(w(i - 1)) / (lit(k0.toDouble) + col(s"r_$i")))
        .otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    joined.withColumn("rrf", score)
      .orderBy(col("rrf").desc, col(idCol)).limit(topK)
  }
}
