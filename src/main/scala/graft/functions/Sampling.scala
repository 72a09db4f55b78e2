package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`TABLESAMPLE`, `rand()`) is the wrong tool for corpus
  * curation at 100 TB: runs aren't reproducible, and re-executing a stage
  * after a failure re-draws the sample. Hash-ranked sampling fixes both —
  * the "random" order is md5(id), portable across engines and stable across
  * retries, re-partitions, and cluster sizes.
  */
object Sampling {

  /** Stratified sample: the `k` hash-first rows per stratum. One shuffle on
    * the stratum key; rank ties broken by id so the cut is total-ordered.
    * For strata far larger than k, Spark's WindowGroupLimit pushes the
    * rank<=k cut into the partial (map) side before the shuffle. */
  def stratified(df: DataFrame, stratum: Column, id: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(id.cast("string")), id)
    df.withColumn("_rk", row_number().over(w)).where(col("_rk") <= k).drop("_rk")
  }

  /** Proportional (rate-based) sample: keep a deterministic `pct`% of rows —
    * the first two md5 hex digits of the id map uniformly onto 0..255, so
    * `pct` percent means hash byte < pct*256/100 (integer threshold). Pure
    * scan-side filter: no shuffle, no state, works mid-stream. */
  def byRate(df: DataFrame, id: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "byRate: pct in [0,100]")
    df.where(conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
      .cast("int") < pct * 256 / 100)
  }

  /** Deterministic global shuffle — the training-order permutation of a
    * corpus. Every pretraining run shuffles its corpus; `orderBy(rand())` is
    * neither reproducible across retries nor portable across engines. The
    * permutation key is md5("seed:id") (change `seed` per epoch for a fresh
    * order), and the global position comes from the DISTRIBUTED serialized
    * row numbering (Kql.serializedRowFns: range partition + per-partition
    * offsets — never a single-partition window). Ties (md5 collisions)
    * break by id, so the permutation is total.
    *
    * 100 TB posture: one range exchange — the same cost as any global sort;
    * the only single-point work is the #partitions-row offsets table. The
    * output VALUES honor the permutation; re-sort by `posCol` (or write
    * sorted-by-range) when physical row order matters downstream. */
  def deterministicShuffle(df: DataFrame, id: Column, seed: Long,
      posCol: String = "pos"): DataFrame = {
    val k = "__shuffle_key"
    require(!df.columns.contains(k),
      s"deterministicShuffle: input must not contain a '$k' column")
    graft.kql.Kql.serializedRowFns(
      df.withColumn(k, md5(concat(lit(s"$seed:"), id.cast("string")))),
      Seq(col(k), id), Seq(graft.kql.Kql.RowNumber(posCol)))
      .drop(k)
  }

  /** Greedy corpus selection under a token budget: rank documents by
    * (score DESC, id ASC) and keep the maximal PREFIX whose cumulative
    * token count stays within `budget` — the "take the best N tokens" cut
    * that follows any scoring stage (DSIR weights, quality scores, dedup
    * survivors). Prefix semantics: the first document that would overflow
    * the budget ends the selection; no skip-and-continue knapsack — the cut
    * is deterministic, order-stable, and integer-exact when `tokens` is
    * integral. Adds `cum_tokens` (the running total through each kept row).
    *
    * 100 TB posture: the ranking is one range exchange and the running
    * total is the distributed cumsum (per-partition sums prefixed via the
    * #partitions-row offsets table) — no single-partition window, no
    * driver-side data. Scores should be integral or decimal: a double score
    * makes the ORDER itself IEEE-tie-hazardous across engines. */
  def selectByTokenBudget(df: DataFrame, score: Column, tokens: Column,
      id: Column, budget: Long): DataFrame = {
    require(budget >= 0, "selectByTokenBudget: budget must be >= 0")
    val t = "__budget_tok"
    require(!df.columns.contains(t),
      s"selectByTokenBudget: input must not contain a '$t' column")
    graft.kql.Kql.serializedRowFns(
      df.withColumn(t, tokens.cast("long")),
      Seq(score.desc, id),
      Seq(graft.kql.Kql.CumSumOf("cum_tokens", col(t))))
      .where(col("cum_tokens") <= budget)
      .drop(t)
  }

  /** Global quantile (curriculum) binning: assign each row to one of `k`
    * equal-population bins by the GLOBAL rank of `score` (ties broken by
    * id, so the binning is total and engine-portable):
    * bin = floor((rank-1)·k / n) ∈ [0, k-1]. The curriculum-learning cut —
    * order training data easy→hard and consume bins in sequence.
    *
    * Exact global quantiles need two passes over the data (or an approx
    * sketch — percentile_approx exists for that posture); this is the exact
    * form: one count aggregate plus the DISTRIBUTED serialized row
    * numbering (range partition + per-partition offsets — never a
    * single-partition NTILE window). Both passes are scan+exchange shaped;
    * the count broadcasts as one row. */
  def quantileBins(df: DataFrame, score: Column, id: Column, k: Int,
      binCol: String = "bin"): DataFrame = {
    require(k >= 1, "quantileBins: k must be >= 1")
    val rn = "__qb_rank"
    require(!df.columns.contains(rn),
      s"quantileBins: input must not contain a '$rn' column")
    val ranked = graft.kql.Kql.serializedRowFns(df, Seq(score, id),
      Seq(graft.kql.Kql.RowNumber(rn)))
    val n = df.agg(count(lit(1)).as("__qb_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(binCol,
        floor((col(rn).cast("long") - 1) * k / col("__qb_n")).cast("int"))
      .drop(rn, "__qb_n")
  }
}
