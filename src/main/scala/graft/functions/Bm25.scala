package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document table — the ranking companion to
  * the posting-list index (FullTextIndex.scala realizes the reference's
  * reserved `IndexType::FullText` slot, segment_metadata.proto:38-43; BM25
  * is the standard published scoring function over exactly the statistics
  * that index already materializes: tf, df, |d|).
  *
  * score(d, q) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
  * IDF(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (the Robertson/Sparck-Jones
  * plus-one form, always ≥ 0).
  *
  * Scale posture (100 TB corpus): the QUERY terms are a literal set, so the
  * per-doc term explode is filtered to them immediately (predicate on the
  * exploded term — no full-vocabulary aggregation, no index scan); df/N/
  * avgdl reduce to ≤|q|+2 scalars broadcast back; the per-doc score is one
  * partial+final sum over the filtered (doc, term) rows; top-k plans as
  * TakeOrderedAndProject (per-partition heaps, no global sort). Nothing is
  * ever collected per-doc on the driver. */
object Bm25 {

  /** Same term alphabet as FullTextIndex: lowercase alphanumeric runs. */
  private def termsWithCounts(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Per-document BM25 scores for `query` (docs with score 0 — no query
    * term — are dropped). Output: (idCol, score). */
  def score(docs: DataFrame, idCol: String, textCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "bm25: query has no terms")
    val toks = docs.select(col(idCol).as("__id"),
      termsWithCounts(col(textCol)).as("__ts"))
      .select(col("__id"), size(col("__ts")).as("__len"), explode(col("__ts")).as("__t"))
    // corpus scalars N and avgdl as a ONE-ROW broadcast side — no driver
    // action inside the plan builder, everything stays lazy. (doc lengths
    // come from a column-pruned length scan, no second explode.) N and
    // avgdl are over the FULL corpus — empty/non-alphanumeric docs count,
    // with length 0, per the standard BM25 definition.
    val lens = docs.select(col(idCol).as("__id"),
      size(termsWithCounts(col(textCol))).as("__len"))
    val corpus = lens.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__len")).cast("double").as("__avgdl"))
    // the query-term filter lands BEFORE any shuffle: only |q| terms survive
    val qf = toks.where(col("__t").isInCollection(qTerms))
    val tf = qf.groupBy("__id", "__t")
      .agg(count(lit(1)).as("__tf"), first(col("__len")).as("__len"))
    // df per query term: ≤|q| rows, broadcast back
    val dfTbl = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val scored = tf.join(broadcast(dfTbl), "__t")
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s", col("__idf") * col("__tf") * (lit(k1) + 1.0) /
        (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / col("__avgdl"))))
    scored.groupBy("__id").agg(sum(col("__s")).as("score"))
      .withColumnRenamed("__id", idCol)
  }

  /** Top-k by score (ties: smallest id) — TakeOrderedAndProject shape. */
  def topK(docs: DataFrame, idCol: String, textCol: String, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    score(docs, idCol, textCol, query, k1, b)
      .orderBy(col("score").desc, col(idCol).asc).limit(k)
}
