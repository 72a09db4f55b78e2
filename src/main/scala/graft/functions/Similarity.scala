package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star extension) over `Array[Float]` columns.
  *
  * Scale design: brute-force top-k is the correctness baseline and is already shaped
  * for scale when the query set is small — broadcast the queries, stream the corpus
  * once, keep per-partition top-k heaps via window+filter (Spark plans the final
  * ranking as a partial top-k). The LSH variant buckets vectors by random-hyperplane
  * signs so only same-bucket pairs are compared: at 100 TB this replaces a
  * corpus×corpus shuffle with an equi-join on a 16-32 bit bucket key. Hyperplanes are
  * pseudo-random from a fixed seed (hash-derived, no RNG) — deterministic.
  */
object Similarity {

  /** Elementwise dot product of two float-array columns, accumulated left-to-right in
    * double: sequential fold ⇒ deterministic, codegen'd (higher-order fn, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus vectors.
    * The query side is broadcast; the corpus is scanned exactly once. Ties break by
    * corpus id for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     queryId: String = "query_id", corpusId: String = "corpus_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryId), col(vecCol).as("__qv"))
    val c = corpus.select(col(corpusId), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("rank"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d) in [-1,1]:
    * derived from a 64-bit avalanche hash of (seed, p, d). */
  private def planeComponent(p: Int, d: Int, seed: Long): Double = {
    var x = seed ^ (p.toLong << 32) ^ d.toLong
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    (x.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane LSH bucket id: sign bits of `numPlanes` projections packed into
    * a long. Cosine-similar vectors collide with high probability. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int = 16, seed: Long = 42L): Column = {
    val bits = (0 until numPlanes).map { p =>
      // projection = sum_d vec[d] * plane[p][d]; fixed fold order → deterministic
      val proj = aggregate(
        zip_with(vec, array((0 until dim).map(d => lit(planeComponent(p, d, seed))): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style ANN top-k: bucket corpus and queries by hyperplane LSH (optionally
    * probing neighbor buckets at Hamming distance 1), then rank within buckets only.
    * Recall < 1 by construction; the 100 TB path — the join is equi on bucket id. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              numPlanes: Int = 12, probeBits: Int = 4,
              queryId: String = "query_id", corpusId: String = "corpus_id",
              vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(corpusId), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), dim, numPlanes, seed).as("bucket"))
    // multi-probe: query also looks in buckets differing in one of the first
    // `probeBits` planes (flipping a sign bit ⇒ XOR with 2^p)
    val qb = queries.select(col(queryId), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), dim, numPlanes, seed).as("__b0"))
    val probes = array((lit(0L) +: (0 until probeBits).map(p => lit(1L << p))): _*)
    val q = qb.withColumn("bucket", explode(transform(probes, m => col("__b0").bitwiseXOR(m))))
      .drop("__b0")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    scored.select(col(queryId), col(corpusId), col("cosine")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket the corpus against itself and
    * keep same-bucket pairs above a cosine threshold (near-dup detection at scale). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                         threshold: Double, numPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), dim, numPlanes, seed).as("bucket"))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }
}
