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
    * sorted-by-range) when physical row order matters downstream.
    * Positions are INT (the engine-wide serialized-row convention): past
    * 2³¹ rows, shuffle per corpus shard (vary `seed` by shard). */
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
    * makes the ORDER itself IEEE-tie-hazardous across engines.
    *
    * BATCH-ONLY by semantics (DEVIATIONS §curation): the result is a
    * prefix of a GLOBAL order, which a stream cannot know — any admitted
    * row can be displaced by a better later arrival. Streaming analogues
    * with sound semantics: rate-based admission (applyMixtureRates) and
    * the bounded weighted reservoir (TopKAgg / q_streaming_wsample). */
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

  /** The STREAMING form of [[quantileBins]]: exact bin thresholds trained
    * on a static POOL (one bounded collect — k−1 longs, the trainModel
    * convention), then [[assignBins]] places any row — batch or stream —
    * by threshold comparison, select-only and stateless.
    *
    * Threshold j (j = 1..k−1) is the smallest pool score in pool bin j, so
    * a row's bin is the count of thresholds ≤ its score. Closure contract:
    * for pool rows with DISTINCT boundary scores this reproduces
    * quantileBins exactly; where a boundary score is TIED across the
    * boundary, rank-based binning splits the tie while thresholds cannot —
    * every tied row lands in the higher bin (deterministic, documented in
    * DEVIATIONS.md; exact streaming quantiles are impossible without the
    * global order, which is the reason this is the posture). Scores must
    * be integral — a double threshold would make the comparison itself
    * IEEE-hazardous across engines. */
  def quantileThresholds(pool: DataFrame, score: Column, id: Column,
      k: Int): Array[Long] = {
    require(k >= 1, "quantileThresholds: k must be >= 1")
    pool.select(score).schema.head.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"quantileThresholds: score must be integral (got $other)")
    }
    val perBin = quantileBins(
        pool.select(score.as("__qt_s"), id.as("__qt_id")),
        col("__qt_s"), col("__qt_id"), k, "__qt_bin")
      .where(col("__qt_bin") >= 1)
      .groupBy(col("__qt_bin"))
      .agg(min(col("__qt_s").cast("long")).as("__qt_lo"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // DENSE k−1 thresholds even when pool bins are sparse (n < k skips bin
    // indices): t_j = min score over bins ≥ j, so the closure count
    // reproduces each pool row's skipped-bin id exactly; trailing bins no
    // pool row reaches stay unreachable (MaxValue)
    val t = Array.fill(k - 1)(Long.MaxValue)
    var carry = Long.MaxValue
    for (j <- (k - 1) to 1 by -1) {
      carry = math.min(carry, perBin.getOrElse(j, Long.MaxValue))
      t(j - 1) = carry
    }
    t // exactly k−1 entries: bounded like any model
  }

  /** Bin-assignment column for [[quantileThresholds]]' model: the count of
    * thresholds ≤ score, as ONE literal-array fold — select-only, composes
    * with a structured stream (no join, no state). Null score → null bin. */
  def assignBins(score: Column, thresholds: Array[Long]): Column =
    // the fold alone would send a null score to bin 0 (null comparisons are
    // falsy under when/otherwise) — guard so null stays null
    when(score.isNotNull,
      aggregate(typedlit(thresholds.toSeq), lit(0),
        (acc, t) => acc + when(t <= score.cast("long"), 1).otherwise(0)))

  /** Temperature-scaled domain mixture (the T5/LLaMA rebalancing step):
    * sample domain `i` with probability ∝ nᵢ^α, α < 1 flattening the head
    * so low-resource domains/languages survive the cut. Given a total row
    * `budget`, each domain keeps rate min(1, budget·wᵢ/(W·nᵢ)) where
    * wᵢ = nᵢ^α and W = Σwᵢ; the keep decision is the deterministic 24-bit
    * hash threshold (md5(domain:id) < rate·2²⁴), so the sample is
    * reproducible across retries, engines, and cluster sizes.
    *
    * Engine-exact despite the fractional power: α is restricted to
    * quarters (1→0.25, 2→0.5, 3→0.75, 4→1.0) computed by composing
    * IEEE-correctly-rounded sqrt — n^0.75 = sqrt(n)·sqrt(sqrt(n)) — then
    * the per-domain weight is quantized to integer micro-units BEFORE the
    * order-sensitive Σ (the DSIR convention: sum integers, not doubles).
    * The remaining float chain (two products, one division, one ×2²⁴ —
    * exact, power of two) is single-rounded per op, hence bit-portable.
    * Documented deviation: rates are expectations — the realized kept
    * count is hash-binomial around budget, not exactly budget; compose
    * with selectByTokenBudget for a hard cut.
    *
    * 100 TB posture: one count aggregate (≤ #domains rows), one broadcast
    * join, one scan-side filter — no data-sized shuffle at all. */
  def temperatureMixture(df: DataFrame, domain: Column, id: Column,
      alphaQuarters: Int, budget: Long, ppmCol: String = "keep_ppm"): DataFrame = {
    require(!df.columns.contains(ppmCol),
      s"temperatureMixture: input must not contain a '$ppmCol' column")
    applyMixtureRates(df, domain, id,
      temperatureRates(df, domain, alphaQuarters, budget, ppmCol), ppmCol)
  }

  /** Exact block packing — the GPT-style "concatenate everything, cut at
    * blockSize" step that turns a document stream into fixed-length
    * training blocks. Unlike [[graft.kql.Kql.CumSumOf]]-based bin
    * assignment (q_seq_packing: whole docs per bin, bins unevenly sized),
    * documents here SPLIT at block boundaries: every block carries exactly
    * `blockSize` tokens (the last one excepted). Emits one SEGMENT row per
    * (document, covered block) with `seg_tokens` (that block's share of
    * the doc) — a doc shorter than a block yields one segment, a doc
    * spanning k boundaries yields k+1.
    *
    * Integer-exact: the global token cumsum is the distributed serialized
    * machinery; the covered block range is [start div B, (end-1) div B]
    * and each share is min(end,(b+1)B) − max(start,bB) — all BIGINT.
    *
    * 100 TB posture: one range exchange (the cumsum layout) plus a
    * scan-side bounded explode (≤ tok/B + 1 segments per doc); no
    * single-partition stage (plan-asserted via the shared machinery).
    * Rows with null/non-positive token counts are dropped (they occupy
    * no block space). */
  def blockPack(df: DataFrame, tokens: Column, id: Column, blockSize: Long,
      blockCol: String = "block", order: Seq[Column] = Nil): DataFrame = {
    require(blockSize >= 1, "blockPack: blockSize must be >= 1")
    val cumc = "__bp_cum"
    val stc = "__bp_start"
    Seq(cumc, stc, blockCol, "seg_tokens").foreach(c =>
      require(!df.columns.contains(c),
        s"blockPack: input must not contain a '$c' column"))
    // filter on the LONG-CAST value actually summed: a fractional count in
    // (0,1) would pass a raw `tokens > 0` check, cast to 0, and emit a
    // descending (phantom) segment range when cum lands on a boundary
    val tokL = tokens.cast("long")
    // concatenation order: by default the id; pass the TRAINING order
    // (e.g. deterministicShuffle's pos) to pack shuffled — id always rides
    // as the tie-break so the order stays total
    val ord = if (order.isEmpty) Seq(id) else order :+ id
    val cum = graft.kql.Kql.serializedRowFns(
      df.where(tokL.isNotNull && tokL > 0), ord,
      Seq(graft.kql.Kql.CumSumOf(cumc, tokL)))
    cum.withColumn(stc, col(cumc) - tokL)
      .withColumn(blockCol, explode(sequence(
        expr(s"$stc div ${blockSize}L"),
        expr(s"($cumc - 1) div ${blockSize}L"))))
      .withColumn("seg_tokens",
        least(col(cumc), (col(blockCol) + 1) * blockSize) -
          greatest(col(stc), col(blockCol) * blockSize))
      .drop(cumc, stc)
  }

  /** Deterministic ratio interleaving (stride scheduling): order rows so
    * that every prefix of the training stream holds the sources in the
    * requested ratio — e.g. ratios code=3, web=7 emits 3 code rows per 7
    * web rows, evenly spread, not in runs. The batch-mixing guarantee the
    * hash shuffle deliberately does NOT give: [[deterministicShuffle]]
    * mixes binomially (a prefix's source counts fluctuate like coin
    * flips); stride scheduling makes them exact to ±1 stride. Row j of
    * source i (hash-ordered within the source, so the within-source order
    * is itself deterministic) gets virtual time (j+1)·10⁶ div rᵢ; the
    * training order is (virtual time, source, id), totally ordered.
    * Sources absent from `ratios` (or with ratio 0) are dropped.
    *
    * 100 TB posture: two range exchanges (the per-source numbering rides
    * the serialized machinery ordered by (source, hash, id) — never a
    * per-source window, whose partitions would be corpus-sized at a
    * handful of sources — plus the final order), one #sources-row
    * broadcast for the per-source offsets. Positions are INT (the
    * engine-wide serialized-row convention): past 2³¹ rows, interleave
    * per corpus shard — same as [[deterministicShuffle]]. */
  def ratioInterleave(df: DataFrame, source: Column, id: Column,
      ratios: Map[String, Int], posCol: String = "pos"): DataFrame = {
    require(ratios.nonEmpty, "ratioInterleave: ratios required")
    require(ratios.values.forall(_ >= 0), "ratioInterleave: ratios must be >= 0")
    // the stride constant is 10^6: a ratio at or above it collapses early
    // virtual times into tie runs, silently voiding the prefix-exactness
    // guarantee — ratios are relative, divide them down
    require(ratios.values.forall(_ < 1000000),
      "ratioInterleave: ratios must be < 1000000 (reduce them — only the " +
        "proportions matter)")
    val kept = ratios.filter(_._2 > 0)
    val rn = "__ri_rn"
    val vt = "__ri_vt"
    Seq(rn, vt, "__ri_r", "__ri_base", "__ri_src", posCol).foreach(c =>
      require(!df.columns.contains(c),
        s"ratioInterleave: input must not contain a '$c' column"))
    // ratio lookup as a literal when-chain (bounded: #sources)
    val ratioCol = kept.foldLeft(lit(null).cast("long")) {
      case (acc, (s, r)) => when(source === s, lit(r.toLong)).otherwise(acc)
    }
    val filtered = df.where(ratioCol.isNotNull).withColumn("__ri_r", ratioCol)
    // global numbering ordered by (source, md5(id), id) → per-source j via
    // the per-source min offset (one #sources-row broadcast)
    val numbered = graft.kql.Kql.serializedRowFns(filtered,
      Seq(source, md5(id.cast("string")), id),
      Seq(graft.kql.Kql.RowNumber(rn)))
    // Per-source base offsets from plain COUNTS over the PRE-numbered frame:
    // the numbering above orders by (source, ...) first, so every source's
    // rows are contiguous and source s's first global row number is exactly
    // 1 + Σ counts of sources that sort before s. Computing min(rn) per
    // source instead (the pre-r18 form) made the whole range+sort numbering
    // subtree a SECOND consumer — a full re-sort/re-window pass of the
    // corpus for a #sources-row table (guide §2.4: remove shuffles
    // outright). The prefix sum over the #ratios-bounded counts table rides
    // the broadcast b<a self-join (the serializedRowFns stats idiom), not a
    // global window, so no SinglePartition exchange enters the plan.
    val counts = filtered.groupBy(source.as("__ri_src"))
      .agg(count(lit(1)).as("__ri_n"))
    val ca = counts.alias("a")
    val cb = counts.alias("b")
    val offsets = ca
      .join(broadcast(cb), col("b.__ri_src") < col("a.__ri_src"), "left_outer")
      .groupBy(col("a.__ri_src").as("__ri_src"))
      .agg((lit(1L) + coalesce(sum(col("b.__ri_n")), lit(0L))).as("__ri_base"))
    val timed = numbered
      .join(broadcast(offsets), source === col("__ri_src"))
      .withColumn(vt, expr(
        s"(cast($rn as bigint) - __ri_base + 1) * 1000000 div __ri_r"))
      .drop("__ri_src", "__ri_base", "__ri_r", rn)
    graft.kql.Kql.serializedRowFns(timed, Seq(col(vt), source, id),
      Seq(graft.kql.Kql.RowNumber(posCol)))
      .drop(vt)
  }

  /** The 24-bit keep-decision hash shared by every rate-thresholded sampler
    * (mixture rates, epoch fractions, split assignment): the first 6 md5 hex
    * digits of the ':'-joined parts, as a long in [0, 2²⁴) — compare against
    * a ppm-of-2²⁴ threshold. One helper so the chain stays bit-identical to
    * the DuckDB oracle convention (`('0x' || substr(md5(...), 1, 6))::BIGINT`)
    * at every call site. */
  def hash24(parts: Column*): Column = {
    // concat (null-propagating, like DuckDB ||), NOT concat_ws (null-skipping):
    // a null part must null the hash so the threshold filter drops the row
    val joined = parts.map(_.cast("string"))
      .reduceLeft((a, b) => concat(a, lit(":"), b))
    conv(substring(md5(joined), 1, 6), 16, 10).cast("long")
  }

  /** The per-domain keep-rate table of [[temperatureMixture]] — ppm of 2²⁴
    * per domain, from the pool's domain counts. Tiny (one row per domain):
    * broadcast it. Split out so the rates can be trained on a static POOL
    * and applied to a different frame — including a structured STREAM
    * ([[applyMixtureRates]] is select-only + broadcast join: stateless). */
  def temperatureRates(pool: DataFrame, domain: Column, alphaQuarters: Int,
      budget: Long, ppmCol: String = "keep_ppm"): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      "temperatureRates: alphaQuarters in [1,4] (0.25/0.5/0.75/1.0)")
    require(budget >= 0, "temperatureRates: budget must be >= 0")
    // null domains are excluded from the pool BEFORE the weight total: the
    // apply-side equi-join can never keep them (null === null is null), so
    // counting their mass into W would silently deflate every real
    // domain's rate
    val counts = pool.where(domain.isNotNull)
      .groupBy(domain.as("__tm_dom"))
      .agg(count(lit(1)).as("__tm_n"))
    val nD = col("__tm_n").cast("double")
    val w = alphaQuarters match {
      case 1 => sqrt(sqrt(nD))
      case 2 => sqrt(nD)
      case 3 => sqrt(nD) * sqrt(sqrt(nD))
      case _ => nD
    }
    val weighted = counts.withColumn("__tm_wq",
      floor(w * lit(1000000.0)).cast("long"))
    val totals = weighted.agg(sum("__tm_wq").as("__tm_W"))
    weighted.crossJoin(broadcast(totals))
      .select(col("__tm_dom"),
        floor(least(lit(1.0),
          (col("__tm_wq").cast("double") * lit(budget.toDouble)) /
            (col("__tm_W").cast("double") * col("__tm_n").cast("double"))) *
          lit(16777216.0)).cast("long").as(ppmCol))
  }

  /** Filter `df` (batch OR stream) by pool-derived mixture rates: keep a row
    * iff its 24-bit domain:id hash clears its domain's ppm threshold. Rows
    * whose domain has no rate are dropped (an unseen domain has rate 0 —
    * nothing is known about its size). Inner broadcast join + scan-side
    * filter: stateless, no watermark, streaming-composable. */
  def applyMixtureRates(df: DataFrame, domain: Column, id: Column,
      rates: DataFrame, ppmCol: String = "keep_ppm"): DataFrame = {
    require(rates.columns.contains("__tm_dom") && rates.columns.contains(ppmCol),
      s"applyMixtureRates: rates must come from temperatureRates " +
        s"(need columns __tm_dom and $ppmCol, got ${rates.columns.mkString(", ")})")
    // guard BOTH entry points (temperatureMixture re-checks, but the
    // streaming path calls here directly): a pre-existing ppmCol/__tm_dom
    // would be ambiguous through the join — or worse, silently read
    for (c <- Seq(ppmCol, "__tm_dom"))
      require(!df.columns.contains(c),
        s"applyMixtureRates: input must not contain a '$c' column")
    df.join(broadcast(rates), domain === col("__tm_dom"))
      .where(hash24(domain, id) < col(ppmCol))
      .drop("__tm_dom")
  }

  /** Token-budget waterfilling — the "how many epochs of each domain" recipe
    * computation (the LLaMA-class data-mixture allocation): distribute a
    * total token `budget` across domains proportional-to-`weight`, but cap
    * each domain at `capMilli`/1000 epochs of its own `nTokens` (repeating a
    * small domain beyond a few epochs hurts more than it helps), and
    * re-distribute what the caps free among the still-uncapped domains.
    * `rounds` fixed redistribution rounds (each round caps a new tier;
    * R = #distinct cap tiers reached suffices, 3 covers real recipes —
    * leftover after the last round is unallocated, never oversubscribed).
    *
    * Integer-exact end to end: allocations are token counts (BIGINT), every
    * share is an integral `div`, so the result replays bit-for-bit as R
    * unrolled CTEs in any engine. Output: one row per domain with `alloc`
    * (tokens granted) and `epochs_milli` (1000·alloc/nTokens).
    *
    * 100 TB posture: operates on the DOMAIN table (one row per domain —
    * thousands, not billions); each round COLLECTS its 2-value aggregate
    * (driver-bounded like any model scalar — this makes the builder EAGER,
    * the pageRank convention) so the output plan stays linear in rounds
    * instead of doubling the seed's lineage per round. Domains with
    * non-positive tokens or weight are
    * excluded (they can absorb nothing). Overflow headroom: shares compute
    * as (budget·weight) — keep Σweight ≤ ~10⁵ at trillion-token budgets
    * (weights are relative; rescale, don't inflate). */
  def budgetWaterfill(domains: DataFrame, domain: Column, nTokens: Column,
      weight: Column, capMilli: Int, budget: Long, rounds: Int = 3): DataFrame = {
    require(capMilli >= 0, "budgetWaterfill: capMilli must be >= 0")
    require(budget >= 0, "budgetWaterfill: budget must be >= 0")
    require(rounds >= 1 && rounds <= 6, "budgetWaterfill: rounds in [1,6]")
    for ((c, n) <- Seq(nTokens -> "nTokens", weight -> "weight"))
      domains.select(c).schema.head.dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
        case other => throw new IllegalArgumentException(
          s"budgetWaterfill: $n must be integral (got $other)")
      }
    // materialize the seed table: it is #domains rows by contract, but its
    // LINEAGE can be a whole curation pipeline (q_recipe_classifier's doms
    // sit on dedup + classifier scoring) — without the barrier every
    // round's 2-value aggregate job re-executes that pipeline (measured
    // 6.7 s -> ~2 s on the recipe bench row). Caching.materialize (the
    // bounded-registry persist) so the barrier cannot accumulate one
    // CacheManager entry per distinct plan forever (r13 ADVICE); the first
    // round's collect below materializes it immediately.
    var cur = Caching.materialize(domains.select(domain.as("dom"),
        nTokens.cast("long").as("n_tok"), weight.cast("long").as("wq"))
      .where(col("n_tok") > 0 && col("wq") > 0)
      .withColumn("__wf_cap", expr(s"(n_tok * $capMilli) div 1000"))
      .withColumn("alloc", lit(0L)))
    // each round's two totals are COLLECTED (2 longs over the persisted
    // domain-sized seed — bounded by contract) and re-enter the plan as
    // literals. The previous crossJoin(broadcast(tot)) form referenced the
    // prior round TWICE per round (directly + through the aggregate), so
    // the plan held 2^rounds copies of the seed's lineage — with a whole
    // curation pipeline upstream (q_recipe_classifier) the optimizer
    // walked hundreds of duplicated scan subtrees per run. The integer
    // arithmetic is unchanged: same sums, same div, literal operands.
    for (_ <- 1 to rounds) {
      val r = cur.agg(
        sum(when(col("alloc") < col("__wf_cap"), col("wq"))),
        coalesce(sum(col("alloc")), lit(0L))).head()
      if (!r.isNullAt(0) && r.getLong(0) > 0) {
        val wact = r.getLong(0)
        val remaining = budget - r.getLong(1)
        cur = cur.withColumn("alloc",
          when(col("alloc") < col("__wf_cap"),
            least(col("__wf_cap"), col("alloc") +
              expr(s"((${remaining}L) * wq) div ${wact}L")))
            .otherwise(col("alloc")))
      } // else: no uncapped active domain — allocations are final
    }
    cur.withColumn("epochs_milli", expr("(alloc * 1000) div n_tok"))
      .drop("__wf_cap")
  }

  /** Materialize a per-domain epoch allocation into the physical training
    * corpus: each document repeats once per FULL epoch of its domain, plus
    * one more in the FRACTIONAL epoch iff its hash clears the fraction —
    * e.g. epochs_milli = 2400 repeats every doc twice and a deterministic
    * ~40% of docs a third time, so the domain's realized token count tracks
    * its allocation. The step between [[budgetWaterfill]] (which decides
    * epochs per domain) and [[deterministicShuffle]] (which orders the
    * result). Output adds `epoch` (0-based; ties every replica to its
    * epoch, so downstream shuffles can seed per-epoch permutations).
    *
    * Deterministic: the fractional-epoch keep is the 24-bit
    * hash(epoch:domain:id) threshold against frac·2²⁴/1000 (exact integer
    * arithmetic — frac is milli-epochs). Streaming-composable for the
    * full-epoch part; rows with no allocation row are dropped.
    *
    * 100 TB posture: one broadcast join (the allocation is #domains rows)
    * + one bounded explode (≤ ceil(max epochs) replicas per row) — scan
    * shaped, no shuffle; the output is epochs× the input by DESIGN. */
  def epochExpand(df: DataFrame, domain: Column, id: Column,
      alloc: DataFrame, epochCol: String = "epoch"): DataFrame = {
    require(alloc.columns.contains("dom") && alloc.columns.contains("epochs_milli"),
      "epochExpand: alloc must come from budgetWaterfill (dom, epochs_milli)")
    require(!df.columns.contains(epochCol),
      s"epochExpand: input must not contain a '$epochCol' column")
    // the allocation's key is renamed internally so an input column named
    // "dom" cannot collide through the join
    val a = broadcast(alloc.select(col("dom").as("__ee_dom"),
      expr("epochs_milli div 1000").as("__ee_full"),
      expr("epochs_milli % 1000").as("__ee_frac")))
    // NB: Spark sequence(0, -1) is DESCENDING, not empty — a zero-allocation
    // domain must produce an empty array (explode then drops the row)
    val last = col("__ee_full") +
      when(col("__ee_frac") > 0, 1L).otherwise(0L) - 1L
    df.join(a, domain === col("__ee_dom"))
      .withColumn(epochCol, explode(when(last >= 0, sequence(lit(0L), last))
        .otherwise(array().cast("array<bigint>"))))
      .where(col(epochCol) < col("__ee_full") ||
        hash24(col(epochCol), domain, id) <
          expr("(__ee_frac * 16777216) div 1000"))
      .drop("__ee_dom", "__ee_full", "__ee_frac")
  }

  /** Diversity-maximizing selection under a global budget `k`: round-robin
    * across clusters, best-first within each. Rows rank within their
    * cluster by (score DESC, id), then the global pick order is
    * (round, score DESC, id) — so pick #1..#C are the best row of every
    * cluster, #C+1 starts the second-best sweep. The curation move for
    * instruction/SFT sets: maximal topic coverage before depth anywhere.
    * Adds `pickCol` (the 1-based global pick order). Integer-exact when
    * `score` is integral; scores should be NON-NULL (engines disagree on
    * default null placement under DESC — filter nulls out first).
    *
    * 100 TB posture: one shuffle on the cluster key for the within-cluster
    * rank (WindowGroupLimit cannot prune here — every row needs its round),
    * then the global cut is a TOP-K, not a global sort: TakeOrderedAndProject
    * keeps a k-row heap per partition and merges heaps — no range exchange,
    * no full-data second shuffle. The pick numbering runs on the k survivors
    * only (a single-partition window BOUNDED at k rows — the scalar-count
    * posture, never data-sized). */
  def diverseSelect(df: DataFrame, cluster: Column, score: Column,
      id: Column, k: Int, pickCol: String = "pick"): DataFrame = {
    require(k >= 0, "diverseSelect: k must be >= 0")
    val rr = "__ds_round"
    require(!df.columns.contains(rr),
      s"diverseSelect: input must not contain a '$rr' column")
    val w = Window.partitionBy(cluster).orderBy(score.desc, id)
    val ranked = df.withColumn(rr, row_number().over(w))
    val top = ranked.orderBy(col(rr), score.desc, id).limit(k)
    top.withColumn(pickCol,
        row_number().over(Window.orderBy(col(rr), score.desc, id)))
      .drop(rr)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res),
    * deterministic: row i gets uniform uᵢ from its id hash and sort key
    * uᵢ^(1/wᵢ); the k largest keys are the sample — inclusion probability
    * is exactly proportional-to-weight without replacement. The quality-
    * weighted corpus draw ("sample 1M docs, proportional to quality²")
    * that byRate (uniform) and temperatureMixture (per-domain) don't cover.
    *
    * Portability: the key is compared as ln(uᵢ)/wᵢ (same order, one exp
    * saved); u = (h₅₂+1)/2⁵² from the first 13 md5 hex digits (division by
    * 2⁵² is exact), ln(u) is quantized to integer micro-nats (the DSIR
    * convention), and the final key is the single-rounded division
    * micro/w — ties broken by id, so the selected SET is engine-exact.
    * Rows with null or non-positive weight have zero probability and are
    * excluded (weight 0 means "never sample"). Weights must be integral;
    * a double weight makes the ORDER itself IEEE-hazardous.
    *
    * 100 TB posture: the key is scan-side and the cut is a TOP-K, not a
    * global sort — TakeOrderedAndProject keeps a k-row heap per partition
    * and merges heaps (ONE pass over the data, no range exchange). The pick
    * numbering runs on the k survivors only (a single-partition window
    * BOUNDED at k rows — the scalar-count posture). Adds `pickCol`. */
  def weightedSample(df: DataFrame, weight: Column, id: Column, k: Int,
      pickCol: String = "pick"): DataFrame = {
    require(k >= 0, "weightedSample: k must be >= 0")
    val kc = "__ws_key"
    require(!df.columns.contains(kc),
      s"weightedSample: input must not contain a '$kc' column")
    // a fractional weight would silently truncate through the long cast —
    // refuse: the caller should scale to integers (weights are relative)
    df.select(weight).schema.head.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"weightedSample: weight must be integral (got $other); scale " +
          "fractional weights to integers — only ratios matter")
    }
    val top = df.where(weight.isNotNull && weight >= 1)
      .withColumn(kc, aresKey(id, weight))
      .orderBy(col(kc).desc, id).limit(k)
    top.withColumn(pickCol, row_number().over(Window.orderBy(col(kc).desc, id)))
      .drop(kc)
  }

  /** The A-Res sort key of [[weightedSample]] — ln(u)/w with u from the id
    * hash and ln quantized to micro-nats. Shared verbatim by the batch
    * operator and the streaming reservoir so the two paths select the SAME
    * sample (and one oracle chain covers both). Residual portability
    * hazard (documented in DEVIATIONS): ln is 1-ulp, not correctly
    * rounded, so the floor can differ across engines for the ~1e-8/row of
    * ids whose ln(u)·1e6 lands within an ulp of an integer. */
  def aresKey(id: Column, weight: Column): Column = {
    val h52 = conv(substring(md5(id.cast("string")), 1, 13), 16, 10)
      .cast("long")
    val lnuMicro = floor(
      log((h52.cast("double") + lit(1.0)) / lit(4503599627370496.0)) *
        lit(1000000.0)).cast("long")
    lnuMicro.cast("double") / weight.cast("long").cast("double")
  }

  /** Bounded top-k reservoir aggregate — the streaming form of the A-Res
    * cut: keeps the k largest (key DESC, id ASC) pairs seen so far. State
    * is AT MOST k pairs per group (bounded, watermark-free); merge is the
    * k-bounded merge of two reservoirs — commutative and associative, so
    * the result is independent of partition/task order. Shard the stream
    * over a fixed small shard count (state = shards×k pairs) and take the
    * global top-k of the exploded reservoirs at read time: each shard's
    * reservoir is a superset of its contribution to the global top-k, so
    * the read-side cut is EXACT.
    *
    * CONTRACT: (key, id) pairs must be UNIQUE per group — the O(1) fast
    * path drops an incoming element that exactly EQUALS the full buffer's
    * worst (correct under uniqueness: an equal pair is beyond the top-k by
    * the total order), so reusing this aggregator with duplicate (key, id)
    * rows would silently dedupe ties at the buffer boundary. The A-Res use
    * holds it by construction (id is the row key; ties break by id). */
  final class TopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 0, "TopKAgg: k must be >= 0")
    private val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sorted(ord).take(k)
    def zero: Seq[(Double, Long)] = Seq.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (a == null) b
      // buffer is sorted by construction: a full buffer whose worst element
      // beats the new row is unchanged — the dominant stream case is O(1),
      // not a k log k re-sort per row
      else if (b.size >= k && (k == 0 || ord.lteq(b.last, a))) b
      else trim(b :+ a)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
