package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine hashed n-gram quality classifier — the CCNet/fastText-style
  * gate of a pretraining pipeline: train a linear text classifier on a
  * small LABELED slice (curated = positive, raw/web = negative), score the
  * whole corpus, keep what classifies as curated. The model here is
  * closed-form multinomial Naive Bayes over the SAME hashed unigram+bigram
  * feature stream as DSIR (Dsir.featureBuckets — one feature convention
  * across the quality tier), which is the linear model fastText reduces to
  * for this task when trained to convergence on bag-of-ngrams.
  *
  * NB closed form, Laplace alpha = 0.5 (the DSIR smoothing convention):
  * per-bucket log-odds w(b) = ln((c1_b+a)/(C1+aB)) − ln((c0_b+a)/(C0+aB))
  * and prior p = ln((N1+a)/(N0+a)); a document's logit is
  * p + Σ_b n_b·w(b), predicted positive when > 0.
  *
  * ENGINE-PORTABILITY (the Dsir.scala micro-nat convention, DEVIATIONS.md):
  * w(b) and p are quantized to integer micro-nats AT THE MODEL — per-bucket
  * scalars whose operands are integer counts, so the rounded values are
  * reproducible in any engine — and every per-document logit is an exact
  * INTEGER sum: order-independent, shuffle-safe, bit-replayable by the
  * DuckDB oracle. Buckets never seen in the labeled slice get the fully
  * smoothed log-odds w0 = ln(a/(C1+aB)) − ln(a/(C0+aB)) (a LEFT join +
  * coalesce — unlike importanceWeights' pool-only inner join, the
  * classifier scores a corpus DISJOINT from its training slice, so unseen
  * buckets are the normal case, not an edge). Featureless documents (no
  * tokens) emit no row, the q_dsir_weights convention.
  *
  * 100 TB posture: the model is one `buckets`-row broadcast built by a
  * map-side-combinable hash aggregate over the labeled slice's feature
  * stream (the slice is small by definition — human/heuristic labels);
  * scoring is per-(doc, bucket) integer counts × that broadcast,
  * re-aggregated per doc — integer sums end-to-end, no driver-side model,
  * no pairwise anything. Scoring composes with a STREAM too: all three
  * tables (weights, default, prior) are broadcast-joined, stateless.
  */
object NgramQuality {

  /** The quantized per-bucket log-odds model: (b, wq) — micro-nat BIGINT
    * weights for every bucket SEEN in the labeled slice. */
  def nbWeights(labeled: DataFrame, textCol: String, isPos: Column,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, "NgramQuality.nbWeights: buckets must be >= 2")
    val lf = labeled.select(isPos.as("__is_p"),
        TextAnalysis.tokens(lower(col(textCol))).as("__t"))
      .select(col("__is_p"),
        explode(Dsir.featureBuckets(col("__t"), buckets)).as("b"))
    // the barrier sits on the BOUNDED per-bucket counts (≤ buckets rows),
    // not the labeled feature stream: the stream is consumed exactly once
    // (this aggregate), while the counts feed several downstream jobs
    // (totals, the weights select, the score-side w0 re-derivation) — each
    // would re-tokenize the slice without it. Caching.materialize (the
    // bounded-registry persist — a bare Dataset.persist here leaked one
    // CacheManager entry per distinct training plan, r13 ADVICE).
    val perBucket = Caching.materialize(lf.groupBy("b").agg(
      sum(when(col("__is_p"), lit(1L)).otherwise(lit(0L))).as("__c1"),
      sum(when(col("__is_p"), lit(0L)).otherwise(lit(1L))).as("__c0")))
    val totals = perBucket.agg(sum("__c1").as("__t1"), sum("__c0").as("__t0"))
    val aB = 0.5 * buckets
    perBucket.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("__c1") + 0.5) / (col("__t1") + aB))
          - log((col("__c0") + 0.5) / (col("__t0") + aB))) * 1e6)
          .cast("long").as("wq"),
        // the default weight for labeled-unseen buckets rides every row
        // (scalar per model, coalesced at score time — saves a third join)
        round((log(lit(0.5) / (col("__t1") + aB))
          - log(lit(0.5) / (col("__t0") + aB))) * 1e6)
          .cast("long").as("wq0"))
  }

  /** The quantized class prior: one row (pq) from the labeled DOC counts
    * (a labeled doc with zero features still counts — it is evidence about
    * class frequency even if it contributes no n-grams). */
  def nbPrior(labeled: DataFrame, isPos: Column): DataFrame =
    labeled.agg(
        sum(when(isPos, lit(1L)).otherwise(lit(0L))).as("__n1"),
        sum(when(isPos, lit(0L)).otherwise(lit(1L))).as("__n0"))
      .select(round((log(col("__n1") + 0.5) - log(col("__n0") + 0.5)) * 1e6)
        .cast("long").as("pq"))

  /** Score `corpus` with a trained model: (id, n_feats, logit_micro,
    * logit, pred). `weights` from [[nbWeights]], `prior` from [[nbPrior]].
    *
    * Degenerate-model contract: a labeled slice with NO features (empty
    * slice, or only empty-text docs) yields an empty weights table and
    * every logit/pred comes back NULL — the lazy chain cannot fail loudly
    * without forcing an action; gate on [[trainModel]] (which requires a
    * nonempty slice) when an eager guard is wanted. */
  def scoreWith(corpus: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, prior: DataFrame, buckets: Int = 4096): DataFrame = {
    val feats = corpus.select(col(idCol).as("id"),
        TextAnalysis.tokens(lower(col(textCol))).as("__t"))
      .select(col("id"), explode(Dsir.featureBuckets(col("__t"), buckets)).as("b"))
    // wq0 is constant across the weights table; a left-join miss needs it,
    // so it ships separately as a one-row broadcast
    val w0 = weights.agg(first(col("wq0")).as("wq0"))
    // ONE aggregation keyed by doc: each feature OCCURRENCE picks up its
    // bucket weight through the broadcast join and the per-doc logit is the
    // direct integer sum — Σ_occurrences w(b) ≡ Σ_b n_b·w(b), same exact
    // integers. The former per-(doc, bucket) count pass added a second
    // full shuffle (keyed (id, b)) before the per-doc one; a doc's features
    // sit in one scan partition, so partial aggregation already collapses
    // this shuffle to ~one row per doc (guide §2.3 "aggregate before you
    // shuffle", §2.4 "remove shuffles outright").
    val scores = feats
      .join(broadcast(weights.select(col("b"), col("wq"))), Seq("b"), "left")
      .crossJoin(broadcast(w0))
      .groupBy("id").agg(
        sum(coalesce(col("wq"), col("wq0"))).as("__s"),
        count(lit(1)).as("__nf"))
    scores.crossJoin(broadcast(prior))
      .select(col("id"), col("__nf").as("n_feats"),
        (col("__s") + col("pq")).as("logit_micro"),
        ((col("__s") + col("pq")).cast("double") / 1e6).as("logit"),
        ((col("__s") + col("pq")) > 0).cast("int").as("pred"))
  }

  /** Train on the labeled slice and score the corpus, one lazy plan (the
    * model's bounded per-bucket counts cache at first action — nbWeights). */
  def classify(corpus: DataFrame, textCol: String, idCol: String,
      labeled: DataFrame, isPos: Column, buckets: Int = 4096): DataFrame =
    scoreWith(corpus, textCol, idCol,
      nbWeights(labeled, textCol, isPos, buckets),
      nbPrior(labeled, isPos), buckets)

  /** Train the DENSE quantized model driver-side (the Dsir.trainModel
    * pattern) for literal/streaming scoring: a buckets-length micro-nat
    * log-odds array — labeled-unseen buckets pre-filled with the fully
    * smoothed default, so the dense lookup IS the batch chain's
    * left-join + coalesce — plus the quantized prior. Quantization is
    * HALF_UP like Spark's `round`, and the driver's Math.log sees the
    * same doubles as the in-engine `log`, so [[scoreMicro]] equals the
    * [[scoreWith]] logit EXACTLY for every document with ≥ 1 feature
    * (featureless docs emit no batch row; filter them upstream when
    * replaying a batch oracle — the q_streaming_dsir convention). */
  def trainModel(labeled: DataFrame, textCol: String, isPos: Column,
      buckets: Int = 4096): (Array[Long], Long) = {
    require(buckets >= 2, "NgramQuality.trainModel: buckets must be >= 2")
    val pb = labeled.select(isPos.as("__is_p"),
        TextAnalysis.tokens(lower(col(textCol))).as("__t"))
      .select(col("__is_p"),
        explode(Dsir.featureBuckets(col("__t"), buckets)).as("b"))
      .groupBy("b").agg(
        sum(when(col("__is_p"), lit(1L)).otherwise(lit(0L))).as("c1"),
        sum(when(col("__is_p"), lit(0L)).otherwise(lit(1L))).as("c0"))
      .collect() // bounded: <= buckets rows
    require(pb.nonEmpty, "NgramQuality.trainModel: labeled slice has no " +
      "features (empty slice or only empty-text docs)")
    val t1 = pb.map(_.getLong(1)).sum
    val t0 = pb.map(_.getLong(2)).sum
    val aB = 0.5 * buckets
    def quant(c1: Long, c0: Long): Long =
      BigDecimal((math.log((c1 + 0.5) / (t1 + aB))
        - math.log((c0 + 0.5) / (t0 + aB))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val w = Array.fill(buckets)(quant(0L, 0L))
    pb.foreach(r => w(r.getLong(0).toInt) = quant(r.getLong(1), r.getLong(2)))
    val docs = labeled.agg(
      sum(when(isPos, lit(1L)).otherwise(lit(0L))).as("n1"),
      sum(when(isPos, lit(0L)).otherwise(lit(1L))).as("n0")).collect().head
    val pq = BigDecimal(
      (math.log(docs.getLong(0) + 0.5) - math.log(docs.getLong(1) + 0.5)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    (w, pq)
  }

  /** Stateless logit column for a pre-trained dense model: the weight array
    * rides the plan as ONE literal (Dsir.scoreMicro's fold) plus the prior
    * — select-only, streaming-composable. Null token array → null logit. */
  def scoreMicro(toks: Column, model: (Array[Long], Long)): Column =
    Dsir.scoreMicro(toks, model._1) + lit(model._2)
}
