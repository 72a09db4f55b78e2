package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  /** Typed partial state for the Bloom build: a long-array bitset mutated
    * in place per row, element-wise OR on merge. The buffer is ONE object
    * per partition per group (ObjectHashAggregate keeps it deserialized
    * between rows), so plan/codegen size is O(1) in sketch width — a 2^17+
    * bit filter costs the plan exactly one aggregate expression, not
    * mBits/64 of them. Bit POSITIONS are computed on the SQL side
    * (xxhash64), so build and probe share one hash definition. */
  final class BitsetOrAgg(words: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], positions: Seq[Long]): Array[Long] = {
      if (positions != null) {
        var i = 0
        while (i < positions.length) {
          val p = positions(i)
          b((p >>> 6).toInt) |= (1L << (p & 63L))
          i += 1
        }
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
    }
    def finish(r: Array[Long]): Seq[Long] = r.toIndexedSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Aggregate: Bloom filter of `key` as array<long> of `mBits/64` words,
    * `k` hash functions (xxhash64 seeded by function index — deterministic
    * and portable). Null keys are skipped. One partial+final OBJECT hash
    * aggregate over a long-array buffer — sketch width never inflates the
    * plan, so KB-to-MB-scale filters are safe. */
  def bloomAgg(key: Column, mBits: Int, k: Int): Column = {
    require(mBits > 0 && mBits % 64 == 0, "bloom: mBits must be a positive multiple of 64")
    require(k >= 1 && k <= 8, "bloom: k in [1,8]")
    val positions = when(key.isNotNull, array(
      (0 until k).map(i => pmod(xxhash64(lit(i), key), lit(mBits.toLong))): _*))
    udaf(new BitsetOrAgg(mBits / 64), ExpressionEncoder[Seq[Long]]())
      .apply(positions)
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

  /** Typed partial state for the count-min build: a long-array counter
    * grid mutated in place, element-wise ADD on merge (same O(1)-plan-size
    * posture as [[BitsetOrAgg]]). Input is (counter positions, weight). */
  final class CounterAddAgg(counters: Int)
      extends Aggregator[(Seq[Long], Long), Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](counters)
    def reduce(b: Array[Long], in: (Seq[Long], Long)): Array[Long] = {
      if (in != null && in._1 != null) {
        var i = 0
        while (i < in._1.length) { b(in._1(i).toInt) += in._2; i += 1 }
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
    }
    def finish(r: Array[Long]): Seq[Long] = r.toIndexedSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Aggregate: count-min sketch of `key` (optionally weighted) as
    * array<long> of d×w counters laid out row-major; row i uses
    * xxhash64(seed 100+i). One partial+final object hash aggregate over a
    * long-array buffer — w and d never inflate the plan. */
  def cmsAgg(key: Column, w: Int, d: Int, weight: Column = lit(1L)): Column = {
    require(w > 0 && d >= 1 && d <= 8, "cms: w > 0, d in [1,8]")
    val positions = when(key.isNotNull, array((0 until d).map { i =>
      lit(i.toLong * w) + pmod(xxhash64(lit(100 + i), key), lit(w.toLong))
    }: _*))
    // counters are longs; a fractional weight must FAIL loudly, not
    // truncate — but a NULL weight contributes 0, it is not an error
    val wd = weight.cast("double")
    val wLong = when(wd.isNull, lit(0L))
      .when(wd === floor(wd), wd.cast("long"))
      .otherwise(call_function("raise_error",
        lit("cms: weights must be integral (long counters)")).cast("long"))
    udaf(new CounterAddAgg(w * d), ExpressionEncoder[(Seq[Long], Long)]())
      .apply(positions, wLong)
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
