package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling weights (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every raw document
  * by how much more likely its hashed n-gram features are under a TARGET
  * distribution (e.g. curated/wiki-like text) than under the RAW pool, then
  * keep/sample by that importance weight. This is the standard
  * quality-steering step of a pretraining pipeline, between dedup and
  * mixture weighting.
  *
  * Model: unigram + bigram features hashed into `buckets` counting buckets
  * (the paper's hashed n-gram generative model; bucket collisions are part
  * of the method). Per-bucket log importance ratio with Laplace smoothing
  * (alpha = 0.5):
  *
  *   lr(b) = ln((t_b + a)/(T + aB)) - ln((r_b + a)/(R + aB))
  *
  * ENGINE-PORTABILITY DEVIATION (documented in DEVIATIONS.md): lr(b) is
  * quantized to integer micro-nats, `lrq(b) = round(1e6 * lr(b))`. The
  * quantization happens at the 4096-entry MODEL — a per-bucket scalar whose
  * operands (integer counts) are identical in any engine, so the rounded
  * value is reproducible — and every downstream per-document score becomes
  * an exact INTEGER sum: order-independent, shuffle-safe, and hash-stable
  * across Spark and the DuckDB oracle. A float log-weight sum would be
  * IEEE-order-dependent across Spark's partial aggregation. The reported
  * `logw` is one final division by 1e6.
  *
  * 100 TB posture: the model is a `buckets`-row broadcast (4096 rows — two
  * integer counts reduced by one map-side-combinable hash aggregate over
  * the feature stream); scoring is the per-(doc,bucket) count aggregate
  * joined against that broadcast and re-aggregated per doc — integer sums
  * end-to-end, no driver-side model collect, no pairwise anything. The
  * feature stream is exploded and shuffled exactly once (persisted; both
  * the model build and the scoring pass read it).
  */
object Dsir {

  /** The hashed feature-bucket stream of a token array: unigram + bigram
    * occurrences, each as `portableHash60(feature) % buckets`. The n-gram
    * hashes are exactly the k=1 / k=2 span tables (Dedup.spanHashes: md5 of
    * the space-joined window — for k=1 the token itself, for k=2
    * "tokᵢ tokᵢ₊₁"), so feature hashing rides the native span kernel when
    * registered. Select-only → streaming-composable. */
  def featureBuckets(toks: Column, buckets: Int): Column =
    transform(
      concat(Dedup.spanHashes(toks, 1), Dedup.spanHashes(toks, 2)),
      sp => pmod(sp.getField("h"), lit(buckets.toLong)))

  /** Train the hashed n-gram model and return the DENSE quantized
    * log-ratio table (bucket → micro-nats) — a buckets-bounded driver-side
    * model (the IVF-centroid bounded-collect pattern) for literal/streaming
    * scoring. Buckets unseen in the pool get the fully-smoothed ratio.
    * Quantization uses HALF_UP like Spark's `round`, so a literal-scored
    * document equals the in-engine broadcast-join score exactly. */
  def trainModel(df: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 4096): Array[Long] = {
    require(buckets >= 2, "Dsir.trainModel: buckets must be >= 2")
    val toks = df.select(isTarget.as("is_t"),
      TextAnalysis.tokens(lower(col(textCol))).as("t"))
    val pb = toks.select(col("is_t"),
        explode(featureBuckets(col("t"), buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("r"),
        sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("tt"))
      .collect() // bounded: <= buckets rows
    val rtot = pb.map(_.getLong(1)).sum
    val ttot = pb.map(_.getLong(2)).sum
    val aB = 0.5 * buckets
    def quant(tt: Long, r: Long): Long =
      BigDecimal((math.log((tt + 0.5) / (ttot + aB))
        - math.log((r + 0.5) / (rtot + aB))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val lrq = Array.fill(buckets)(quant(0L, 0L))
    pb.foreach(row => lrq(row.getLong(0).toInt) =
      quant(row.getLong(2), row.getLong(1)))
    lrq
  }

  /** Stateless scoring column for a pre-trained model: the quantized table
    * rides the plan as ONE literal array and each document folds its own
    * feature buckets into an exact integer micro-nat sum — select-only, so
    * it composes with a streaming DataFrame (no broadcast join, no state).
    * The fold is an interpreted HOF, but the per-element work is one
    * element_at on a literal — fine for stream rates; the batch path keeps
    * the broadcast-join shape.
    *
    * Equality contract vs the batch chain: for a document whose feature
    * buckets all appear in the TRAINING pool, the score equals
    * `importanceWeights` over that pool exactly (integer sums of the same
    * quantized model rows). A genuinely NEW document may hit pool-unseen
    * buckets — those contribute the fully-smoothed ratio quant(0,0) (the
    * paper's add-alpha posture; see trainModel), which the pool-only batch
    * join never materializes. Null token array → null score; a doc with
    * ZERO features (empty array) scores 0 while the batch chain emits no
    * row at all — filter featureless docs upstream when replaying a batch
    * oracle (q_streaming_dsir does). */
  def scoreMicro(toks: Column, lrq: Array[Long]): Column =
    aggregate(featureBuckets(toks, lrq.length), lit(0L),
      (acc, b) => acc + element_at(typedlit(lrq.toSeq), b.cast("int") + 1))

  /** Importance weights per document. `isTarget` marks the target-domain
    * rows of `df` itself (in-corpus target, the paper's setup: a curated
    * slice steers selection over the whole pool).
    *
    * Output: (id, n_feats, logw_micro, logw, keep) — keep = logw > 0, i.e.
    * the document looks more target-like than pool-like. */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, "Dsir.importanceWeights: buckets must be >= 2")
    val toks = df.select(col(idCol).as("id"), isTarget.as("is_t"),
      TextAnalysis.tokens(lower(col(textCol))).as("t"))
    // unigram + bigram occurrence stream, each occurrence reduced to its
    // 8-byte bucket id before the (single) shuffle
    // materialized through the bounded registry: the stream feeds the model
    // aggregate AND the per-doc scoring counts; a bare Dataset.persist here
    // leaked a CacheManager entry per distinct plan (r13 ADVICE)
    val feats = Caching.materialize(toks.select(col("id"), col("is_t"),
        explode(featureBuckets(col("t"), buckets)).as("b")))
    // the model: per-bucket raw and target occurrence counts (buckets-bounded)
    val perBucket = feats.groupBy("b").agg(
      count(lit(1)).as("r"),
      sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("tt"))
    val totals = perBucket.agg(sum("r").as("rtot"), sum("tt").as("ttot"))
    val aB = 0.5 * buckets
    val lr = perBucket.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("tt") + 0.5) / (col("ttot") + aB))
          - log((col("r") + 0.5) / (col("rtot") + aB))) * 1e6)
          .cast("long").as("lrq"))
    // scoring: ONE per-doc aggregation — each feature occurrence picks up
    // its bucket's quantized ratio through the broadcast join and the
    // per-doc score is the direct integer sum (Σ_occurrences lrq(b) ≡
    // Σ_b n_b·lrq(b), bit-identical). The former per-(doc,bucket) count
    // pass was a second full shuffle keyed (id, b); a doc's features sit
    // in one partition of the persisted stream, so partial aggregation
    // already collapses the per-doc shuffle to ~one row per doc (guide
    // §2.3/§2.4).
    val scores = feats
      .join(broadcast(lr), Seq("b"))
      .groupBy("id").agg(sum(col("lrq")).as("s"),
        count(lit(1)).as("nf"))
    scores.select(col("id"), col("nf").as("n_feats"),
      col("s").as("logw_micro"),
      (col("s").cast("double") / 1e6).as("logw"),
      (col("s") > 0).cast("int").as("keep"))
  }
}
