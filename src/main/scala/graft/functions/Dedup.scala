package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication operators (north-star extension; the reference's own dedup is
  * row-level on `(_ts, _dedup)` at segment merge — `/root/reference/README.md:15,22`).
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison. Exact dedup is a
  * hash-groupBy (one shuffle on a 128-bit digest). MinHash-LSH and SimHash reduce
  * candidate generation to equi-joins on band/bucket keys — the only pairs ever
  * materialized are hash-bucket collisions, which is what makes near-dedup feasible on
  * a 100 TB corpus where brute force is ~10^21 comparisons.
  */
object Dedup {

  /** Normalized content digest for exact dedup: lowercase, trim, collapse whitespace. */
  def contentHash(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact dedup: keep one deterministic representative per content hash (min id).
    * One shuffle on the digest; map-side partial aggregation shrinks it first. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(contentHash(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate groups: digest → group size + representative id. */
  def duplicateGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(contentHash(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("rep_id"))

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** MinHash signature of a shingle set: for seed i, min over shingles of
    * xxhash64(shingle, i). Entirely codegen'd array expressions — per-row cost is
    * O(#shingles × #hashes) with zero shuffle; deterministic (seeded, no RNG). */
  def minHashSignature(shingleSet: Column, numHashes: Int = 128): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingleSet, s => xxhash64(s, lit(i))))): _*)

  /** LSH band keys: split a signature into `bands` bands of `signatureLen/bands` rows
    * and hash each band. Two docs sharing ≥1 band key become a candidate pair. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      concat_ws("_", lit(b), hash(slice(signature, b * rowsPerBand + 1, rowsPerBand)))): _*)

  /** Candidate near-duplicate pairs via MinHash-LSH, verified by signature-estimated
    * Jaccard ≥ threshold. Pipeline: shingle → signature → explode band keys →
    * self-equi-join on band key (the ONLY join; shuffles on band key, never all-pairs)
    * → dedupe pairs → verify. */
  def minHashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          numHashes: Int = 128, bands: Int = 32,
                          threshold: Double = 0.7, shingleK: Int = 3): DataFrame = {
    val rows = numHashes / bands
    // Each stage below is a separate projection ON PURPOSE: tokens → shingles →
    // signature. Inlining them re-evaluates the upstream expression once per lambda
    // element AND once per hash seed (64×), which is catastrophically slow — see the
    // perf contract on TextAnalysis.shinglesOf.
    val sigs = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), TextAnalysis.shinglesOf(col("__toks"), shingleK).as("__sh"))
      .select(col("id"), minHashSignature(col("__sh"), numHashes).as("sig"))
      .withColumn("band", explode(lshBandKeys(col("sig"), bands, rows)))
    val a = sigs.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / numHashes).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash of a token multiset: sign-sum of per-token hash bits. Expressed as
    * a fold over tokens accumulating 64 counters packed sparsely: implemented via
    * per-bit aggregate() passes would be O(64·n); instead accumulate into an array of
    * 64 ints with a single fold. */
  def simHash(tokensCol: Column): Column = {
    val counts = aggregate(tokensCol,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, i) => c + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
      })
    aggregate(zip_with(counts, sequence(lit(0), lit(63)),
      (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hammingDistance64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: block on k rotations/bit-chunks of the simhash so
    * pairs within `maxHamming` collide in ≥1 block (pigeonhole over 4 chunks ⇒ catches
    * all pairs with distance ≤ 3 exactly, plus extras filtered by the verify step). */
  def simHashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), simHash(col("__toks")).as("sim"))
    val chunks = 4 // 16-bit chunks; dist ≤3 ⇒ at least one chunk identical
    val exploded = withSig.withColumn("chunk_id", explode(array((0 until chunks).map(lit(_)): _*)))
      .withColumn("chunk_key", concat_ws("_", col("chunk_id"),
        call_function("shiftrightunsigned", col("sim"), col("chunk_id") * 16)
          .bitwiseAND(lit(0xffffL))))
    val a = exploded.select(col("chunk_key"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = exploded.select(col("chunk_key"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk_key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", hammingDistance64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** n-gram Jaccard verification for a candidate pair set (post-LSH refinement). */
  def ngramJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")
}
