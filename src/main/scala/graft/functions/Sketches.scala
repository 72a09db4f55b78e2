package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mergeable membership / frequency sketches for corpus-scale pipelines:
  * a Bloom filter (set membership, no false negatives) and a count-min
  * sketch (frequency upper bound), both as DETERMINISTIC SQL-composable
  * aggregates in the same mold as the tdigest/hll sketches
  * (QuantileSketch.scala): partial+final hash aggregation, element-wise
  * exact merges (bit-or / add — associative and commutative, safe in any
  * partial-aggregation order), and bit-for-bit replayability so a stored
  * sketch can be re-audited by an independent engine.
  *
  * Scale posture (the reason these exist): at 100 TB, "does this key exist
  * in shard A" / "is this key frequent" must not require shuffling shard A.
  * Both sketches reduce a shard to a few KB per BUCKET — the sketch table is
  * joined by bucket equi-key (never broadcast-required, never a second scan
  * of the corpus), and because a Bloom filter has NO false negatives and a
  * CMS never under-counts, using them as PRE-FILTERS before an exact
  * verification join preserves exact query semantics: the sketch prunes,
  * the equi-join proves. Reference tie-in: sketch-backed dedup/ingest is the
  * reference's merge-dedup posture (README.md:15,22) restated for reads.
  */
object Sketches {

  private def bitOf(h: Column): Column =
    call_function("shiftleft", lit(1L), h.bitwiseAND(lit(63L)).cast("int"))

  /** Aggregate: Bloom filter of `key` as array<long> of `mBits/64` words,
    * `k` hash functions (xxhash64 seeded by function index — deterministic
    * and portable). Null keys are skipped. Word `j` is the bit-or of every
    * row's contribution to that word — k conditional terms per word, all
    * inside one partial+final hash aggregate. */
  def bloomAgg(key: Column, mBits: Int, k: Int): Column = {
    require(mBits > 0 && mBits % 64 == 0, "bloom: mBits must be a positive multiple of 64")
    require(k >= 1 && k <= 8, "bloom: k in [1,8]")
    val W = mBits / 64
    val hs = (0 until k).map(i => pmod(xxhash64(lit(i), key), lit(mBits.toLong)))
    val words = (0 until W).map { j =>
      val contrib = hs.map(h =>
        when(shiftright(h, 6) === j, bitOf(h)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _)
      bit_or(when(key.isNotNull, contrib).otherwise(lit(0L)))
    }
    array(words: _*)
  }

  /** Scalar: membership probe — true iff all k bits are set. `k` must match
    * the build (the sketch is self-describing in size, not in k). A false
    * result is DEFINITIVE (no false negatives); a true result is a
    * candidate to be proven by an exact join. */
  def bloomContains(bloom: Column, key: Column, k: Int): Column = {
    val m = size(bloom).cast("long") * lit(64L)
    (0 until k).map { i =>
      val h = pmod(xxhash64(lit(i), key), m)
      element_at(bloom, (shiftright(h, 6) + 1).cast("int"))
        .bitwiseAND(bitOf(h)) =!= 0L
    }.reduce(_ && _)
  }

  /** Aggregate: union pre-built Bloom filters (element-wise bit-or fold —
    * the collect is bounded by input GROUPS, not rows, like tdigest_merge). */
  def bloomMerge(bloom: Column): Column = {
    val cl = collect_list(bloom)
    aggregate(slice(cl, lit(2), greatest(size(cl) - 1, lit(0))),
      element_at(cl, 1),
      (acc, b) => zip_with(acc, b, _ bitwiseOR _))
  }

  /** Aggregate: count-min sketch of `key` (optionally weighted) as
    * array<long> of d×w counters laid out row-major; row i uses
    * xxhash64(seed 100+i). Each counter is one conditional sum — the whole
    * sketch is a single partial+final hash aggregate. */
  def cmsAgg(key: Column, w: Int, d: Int, weight: Column = lit(1L)): Column = {
    require(w > 0 && d >= 1 && d <= 8, "cms: w > 0, d in [1,8]")
    array((0 until d).flatMap { i =>
      val h = pmod(xxhash64(lit(100 + i), key), lit(w.toLong)).cast("int")
      (0 until w).map(j =>
        sum(when(key.isNotNull && (h === j), weight).otherwise(lit(0L))))
    }: _*)
  }

  /** Scalar: frequency estimate — min over rows of the hashed counter.
    * NEVER under-counts (every occurrence lands in each row's counter), so
    * `estimate >= true count` always holds: a threshold pre-filter on the
    * estimate keeps every truly-frequent key. */
  def cmsEstimate(cms: Column, key: Column, w: Int, d: Int): Column =
    (0 until d).map { i =>
      val h = pmod(xxhash64(lit(100 + i), key), lit(w.toLong)).cast("int")
      element_at(cms, lit(i * w) + h + 1)
    }.reduce(least(_, _))

  /** Aggregate: merge count-min sketches (element-wise add fold; bounded by
    * input groups). Sketches must share (w, d). */
  def cmsMerge(cms: Column): Column = {
    val cl = collect_list(cms)
    aggregate(slice(cl, lit(2), greatest(size(cl) - 1, lit(0))),
      element_at(cl, 1),
      (acc, s) => zip_with(acc, s, _ + _))
  }
}
