package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kql.Kql._
import graft.functions.{Dedup, Similarity, TextAnalysis => TA}
import graft.sources.Tables

/** LLM-training-data-pipeline operators (the driver's north-star extensions):
  * deduplication (exact, MinHash-LSH, SimHash), text analysis (token stats, quality,
  * language-ID, fingerprinting), and embedding similarity search (brute-force +
  * LSH-bucketed ANN). Oracle SQL is provided where DuckDB can express the same
  * computation deterministically; hash/sketch-based operators get rows-only checks
  * plus ScalaTest property coverage.
  */
object NorthStarQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val EMB_DIM = 64

  val defs: Seq[QueryDef] = Seq(

    // --- text analysis ------------------------------------------------------
    QueryDef("q_text_stats",
      (s, d) => T(s, d, "documents")
        .project(col("doc_id"),
          TA.tokenCount(col("text")).cast("long").as("n_tokens"),
          TA.distinctTokenCount(col("text")).cast("long").as("n_distinct"),
          length(col("text")).cast("long").as("n_chars"),
          (length(col("text")) - length(expr("replace(text, ' ', '')")))
            .cast("long").as("n_spaces"))
        .sortBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             |  CAST(length(text) AS BIGINT) AS n_chars,
             |  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("q_token_freq",
      (s, d) => T(s, d, "documents")
        .mvExpand(TA.tokens(lower(col("text"))), "token")
        .summarize(Seq(col("token")), count(lit(1)).as("n"))
        .top(50, col("n").desc, col("token")),
      Some("""SELECT token, COUNT(*) AS n FROM (
             |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
             |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    // --- exact dedup --------------------------------------------------------
    QueryDef("q_exact_dedup",
      (s, d) => Dedup.duplicateGroups(T(s, d, "documents"), "text", "doc_id")
        .sortBy(col("content_hash")),
      Some("""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
             |  COUNT(*) AS n_dups, MIN(doc_id) AS rep_id
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    QueryDef("q_exact_dedup_keep",
      (s, d) => Dedup.exactDedup(T(s, d, "documents"), "text", "doc_id")
        .project(col("doc_id"), col("lang"), col("source"))
        .sortBy(col("doc_id")),
      Some("""SELECT doc_id, lang, source FROM (
             |  SELECT doc_id, lang, source, ROW_NUMBER() OVER (
             |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |    ORDER BY doc_id) AS rn
             |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // --- quality scoring (deterministic arithmetic, oracle-matched) ---------
    QueryDef("q_quality",
      (s, d) => T(s, d, "documents")
        .project(col("doc_id"),
          TA.tokenCount(col("text")).cast("long").as("n_tokens"),
          TA.stopwordCount(col("text")).cast("long").as("n_stop"))
        .sortBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              |  CAST(len(list_filter(string_split(lower(text), ' '),
              |    t -> list_contains(${TA.stopwords.mkString("['", "','", "']")}, t))) AS BIGINT) AS n_stop
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // --- language-ID + quality score (heuristic; rows-only checks) ----------
    QueryDef("q_langid",
      (s, d) => T(s, d, "documents")
        .extend("predicted" -> TA.languageId(col("text")))
        .summarize(Seq(col("lang"), col("predicted")), count(lit(1)).as("n"))
        .sortBy(col("lang"), col("predicted")),
      None),

    QueryDef("q_quality_score",
      (s, d) => T(s, d, "documents")
        .extend("score" -> TA.qualityScore(col("text")))
        .project(col("doc_id"), col("score"))
        .sortBy(col("doc_id")),
      None),

    QueryDef("q_fingerprint",
      (s, d) => T(s, d, "documents")
        .project(col("doc_id"), TA.fingerprint(col("text")).as("fp"))
        .summarize(Seq(col("fp")), count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
        .sortBy(col("fp")),
      None),

    // --- near-dedup (sketch-based; rows-only + ScalaTest) -------------------
    QueryDef("q_minhash_pairs",
      (s, d) => Dedup.minHashNearDupPairs(T(s, d, "documents"), "text", "doc_id",
          numHashes = 64, bands = 16, threshold = 0.5)
        .sortBy(col("id_a"), col("id_b")),
      None),

    QueryDef("q_simhash_pairs",
      (s, d) => Dedup.simHashNearDupPairs(T(s, d, "documents"), "text", "doc_id",
          maxHamming = 8)
        .sortBy(col("id_a"), col("id_b")),
      None),

    QueryDef("q_ngram_jaccard",
      (s, d) => {
        // verify MinHash candidates with exact n-gram Jaccard (two-stage pipeline)
        val docs = T(s, d, "documents")
          .project(col("doc_id"), TA.tokens(lower(col("text"))).as("__toks"))
          .project(col("doc_id"), TA.shinglesOf(col("__toks"), 3).as("sh"))
        val cand = Dedup.minHashNearDupPairs(T(s, d, "documents"), "text", "doc_id",
          numHashes = 64, bands = 16, threshold = 0.3)
        cand.joinKql(docs.project(col("doc_id").as("id_a"), col("sh").as("sh_a")),
            Seq("id_a"), "inner")
          .joinKql(docs.project(col("doc_id").as("id_b"), col("sh").as("sh_b")),
            Seq("id_b"), "inner")
          .extend("jaccard" -> Dedup.ngramJaccard(col("sh_a"), col("sh_b")))
          .where_(col("jaccard") >= 0.3)
          .project(col("id_a"), col("id_b"), col("jaccard"))
          .sortBy(col("id_a"), col("id_b"))
      },
      None),

    // --- embedding similarity ----------------------------------------------
    QueryDef("q_cosine_topk",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.bruteForceTopK(
            emb.where_(col("vec_id") < 5).projectRename("query_id" -> "vec_id"),
            emb.projectRename("corpus_id" -> "vec_id"),
            k = 10)
          .project(col("query_id"), col("corpus_id"), col("rank"))
          .sortBy(col("query_id"), col("rank"))
      },
      Some("""SELECT query_id, corpus_id, CAST(rank AS INT) AS rank FROM (
             |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
             |  FROM embeddings q, embeddings c
             |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
             |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    QueryDef("q_cosine_topk_lsh",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Similarity.lshTopK(
            emb.where_(col("vec_id") < 5).projectRename("query_id" -> "vec_id"),
            emb.projectRename("corpus_id" -> "vec_id"),
            k = 10, dim = EMB_DIM)
          .project(col("query_id"), col("corpus_id"), col("rank"))
          .sortBy(col("query_id"), col("rank"))
      },
      None),

    QueryDef("q_embedding_neardup",
      (s, d) => Similarity.cosineNearDupPairs(T(s, d, "embeddings"), "vec_id",
          "embedding", EMB_DIM, threshold = 0.95)
        .project(col("id_a"), col("id_b"))
        .sortBy(col("id_a"), col("id_b")),
      None),

    // --- centroid stats over embeddings (deterministic per-dim extremes) ----
    QueryDef("q_embedding_stats",
      (s, d) => T(s, d, "embeddings")
        .summarize(Seq(col("label")),
          count(lit(1)).as("n"),
          max(element_at(col("embedding"), 1).cast("double")).as("max_d0"),
          min(element_at(col("embedding"), 1).cast("double")).as("min_d0"))
        .sortBy(col("label")),
      Some("""SELECT label, COUNT(*) AS n,
             |  MAX(CAST(embedding[1] AS DOUBLE)) AS max_d0,
             |  MIN(CAST(embedding[1] AS DOUBLE)) AS min_d0
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin))
  )
}
