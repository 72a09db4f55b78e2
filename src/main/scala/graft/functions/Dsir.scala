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
    val feats = toks.select(col("id"), col("is_t"),
        explode(concat(col("t"),
          when(size(col("t")) >= 2,
            transform(sequence(lit(1), size(col("t")) - 1),
              i => concat_ws(" ", element_at(col("t"), i),
                element_at(col("t"), i + 1))))
            .otherwise(array().cast("array<string>")))).as("f"))
      .select(col("id"), col("is_t"),
        pmod(Dedup.portableHash60(col("f")), lit(buckets.toLong)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    // scoring: per-(doc,bucket) integer counts x the broadcast model
    val scores = feats.groupBy("id", "b").agg(count(lit(1)).as("n"))
      .join(broadcast(lr), Seq("b"))
      .groupBy("id").agg(sum(col("n") * col("lrq")).as("s"),
        sum(col("n")).as("nf"))
    scores.select(col("id"), col("nf").as("n_feats"),
      col("s").as("logw_micro"),
      (col("s").cast("double") / 1e6).as("logw"),
      (col("s") > 0).cast("int").as("keep"))
  }
}
