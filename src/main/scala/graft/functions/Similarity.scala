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

  /** True when the graft native expressions are registered in the active session
    * (spark.sql.extensions=graft.plans.GraftExtensions). */
  private def nativeExprs: Boolean =
    try org.apache.spark.sql.SparkSession.active.catalog
      .functionExists(graft.plans.NativeExpressions.dotName)
    catch { case _: Throwable => false }

  /** Elementwise dot product of two float-array columns, accumulated left-to-right
    * in double — identical semantics on both paths: the native codegen'd DotF32
    * expression when the session has GraftExtensions installed (primitive loop
    * inside WholeStageCodegen), else the higher-order-function fold (interpreted,
    * CodegenFallback). */
  def dot(a: Column, b: Column): Column =
    if (nativeExprs) call_function(graft.plans.NativeExpressions.dotName, a, b)
    // null parity with the native DotF32 expression: a null element (or the null
    // padding zip_with adds past the shorter array's end) contributes 0 to the
    // fold, matching native's skip-null / truncate-to-shorter semantics
    else aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + coalesce(v, lit(0.0)))

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

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d) in [-1,1]
    * (single source of truth shared with the native expression). */
  private def planeComponent(p: Int, d: Int, seed: Long): Double =
    graft.plans.NativeExpressions.planeComponent(p, d, seed)

  /** All `nProj` hyperplane projections of a vector in ONE traversal: zip each vector
    * element with its per-plane weight row and elementwise-sum the contribution
    * arrays. The weight matrix ships as a SINGLE typedlit literal node — building it
    * from dim×nProj nested array() constructors (round-1 shape) put 5000+ nodes into
    * the expression tree and the optimizer spent a minute per plan walking them. */
  def lshProjections(vec: Column, dim: Int, nProj: Int, seed: Long = 42L): Column =
    if (nativeExprs)
      call_function(graft.plans.NativeExpressions.hyperplanesName,
        vec, lit(dim), lit(nProj), lit(seed))
    else {
      val dimWeights = typedlit((0 until dim).map(d =>
        (0 until nProj).map(p => planeComponent(p, d, seed))))
      aggregate(
        zip_with(vec, dimWeights, (x, w) => transform(w, wp => x.cast("double") * wp)),
        array_repeat(lit(0.0), nProj),
        (acc, contrib) => zip_with(acc, contrib, (a, c) => a + c))
    }

  /** Multi-table sign-LSH keys: `numTables` independent tables of `bitsPerTable` sign
    * bits each, packed as `(table << bitsPerTable) | bits` — an array of `numTables`
    * long keys per vector. A pair collides if it lands in the same bucket of ANY
    * table: recall = 1-(1-p^b)^L for per-plane agreement p, tunable without touching
    * the join shape (always equi on one 8-byte key).
    *
    * IMPORTANT perf contract: `proj` must be a materialized attribute (a column from a
    * previous projection), not a nested lshProjections(...) expression — Catalyst
    * inlines expression arguments into every lambda use (numTables × bitsPerTable
    * re-evaluations otherwise). */
  def lshTableKeys(proj: Column, numTables: Int, bitsPerTable: Int): Column =
    array((0 until numTables).map { t =>
      (0 until bitsPerTable).map { j =>
        when(element_at(proj, t * bitsPerTable + j + 1) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).+(lit(t.toLong << bitsPerTable))
    }: _*)

  /** ANN top-k via multi-table sign-LSH. Candidate generation is ids-only: vectors
    * never ride the bucket-key shuffle; the (distinct) candidate ids re-attach their
    * vectors once and cosine is computed once per pair. Recall < 1 by construction —
    * the 100 TB path where the brute-force corpus×query scan is too expensive. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              numTables: Int = 16, bitsPerTable: Int = 5,
              queryId: String = "query_id", corpusId: String = "corpus_id",
              vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val nProj = numTables * bitsPerTable
    val cKeys = corpus.select(col(corpusId), col(vecCol).as("__cv"))
      .withColumn("__proj", lshProjections(col("__cv"), dim, nProj, seed))
      .select(col(corpusId), explode(lshTableKeys(col("__proj"), numTables, bitsPerTable)).as("bucket"))
    val qKeys = queries.select(col(queryId), col(vecCol).as("__qv"))
      .withColumn("__proj", lshProjections(col("__qv"), dim, nProj, seed))
      .select(col(queryId), explode(lshTableKeys(col("__proj"), numTables, bitsPerTable)).as("bucket"))
    val cand = cKeys.join(broadcast(qKeys), Seq("bucket"))
      .filter(col(queryId) =!= col(corpusId))
      .select(col(queryId), col(corpusId)).distinct()
    val scored = cand
      .join(broadcast(queries.select(col(queryId), col(vecCol).as("__qv"))), Seq(queryId))
      .join(corpus.select(col(corpusId), col(vecCol).as("__cv")), Seq(corpusId))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    scored.select(col(queryId), col(corpusId), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs via multi-table sign-LSH self-join:
    * ids-only bucket join, distinct pairs, one verification per pair. For high
    * thresholds (true near-dups) per-plane agreement p ≈ 1 so a handful of tables
    * gives ~exact recall while only same-bucket pairs are ever compared.
    *
    * The prepared table (vector + norm + bucket keys) is computed ONCE and persisted
    * — both join sides and both re-attach sides read the cache, and verification is
    * a single dot-product fold per pair (norms precomputed per vector, not 2× per
    * pair). bitsPerTable=8 keeps buckets selective (collision fraction 2^-8/table):
    * at round-1's b=6 the verify stage drowned in random-vector collisions. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                         threshold: Double, numTables: Int = 10, bitsPerTable: Int = 8,
                         seed: Long = 42L): DataFrame = {
    val nProj = numTables * bitsPerTable
    val prepared = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("__norm", norm(col("v")))
      .withColumn("__proj", lshProjections(col("v"), dim, nProj, seed))
      .select(col("id"), col("v"), col("__norm"),
        lshTableKeys(col("__proj"), numTables, bitsPerTable).as("__keys"))
      .persist()
    val keyed = prepared.select(col("id"), explode(col("__keys")).as("bucket"))
    val l = keyed.select(col("bucket"), col("id").as("id_a"))
    val r = keyed.select(col("bucket"), col("id").as("id_b"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(prepared.select(col("id").as("id_a"), col("v").as("va"), col("__norm").as("na")), Seq("id_a"))
      .join(prepared.select(col("id").as("id_b"), col("v").as("vb"), col("__norm").as("nb")), Seq("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
