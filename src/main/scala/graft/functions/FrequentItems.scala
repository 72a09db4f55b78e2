package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sketch-path heavy hitters: a SpaceSaving frequent-items aggregate
  * (Metwally, Agrawal, El Abbadi — "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams", ICDT 2005) behind Kusto's `top-hitters`
  * plugin (reference KQL surface: `/root/reference/README.md:33-34`).
  *
  * Why a sketch when the exact plan is also distributive: at 100 TB a
  * high-cardinality column (url, user agent, token) makes the exact
  * `groupBy(value).count` shuffle one row PER DISTINCT VALUE — billions of
  * rows through the exchange just to read off a top-10. The sketch path
  * bounds state to `capacity` counters per partition, ships one tiny map per
  * partition, and touches the full data only with a broadcast semi-join on
  * the surviving candidates.
  *
  * Determinism contract (the engine-wide requirement): per-partition reduce
  * is SpaceSaving with a total-order tie-break (evict the (count, key)-min),
  * deterministic given partition row order; the MERGE of partition states is
  * EXACT map addition — commutative and associative, so the merged state is
  * independent of task completion order (at most partitions×capacity
  * entries, kilobytes even at 1000 executors). Candidate counts are then
  * made EXACT by one verify pass (broadcast the ≤capacity candidates,
  * map-side partial agg), so the emitted top-N rows equal the exact oracle
  * whenever the true top-N survive the sketch — guaranteed for any value
  * with frequency > n/capacity (the SpaceSaving error bound). */
object FrequentItems {

  /** SpaceSaving counter table: the key→count map (the serialized state)
    * plus a TRANSIENT (count, key)-sorted index that turns eviction from an
    * O(capacity) `minBy` scan into an O(log capacity) tree lookup — measured
    * on the adversarial all-distinct stream (every post-fill row evicts),
    * 100k rows at capacity 4096 took 18.6 s with the scan (BENCH_NOTES).
    * The index is built lazily at the FIRST eviction (or first access after
    * kryo deserialization, which skips the transient field): a stream that
    * never fills `capacity` can never evict, so the common skewed path pays
    * zero tree maintenance; once built, hit/insert keep it in sync. */
  final class SpaceSavingBuf extends Serializable {
    val m: scala.collection.mutable.HashMap[String, Long] =
      scala.collection.mutable.HashMap.empty
    @transient private var idx0: scala.collection.mutable.TreeSet[(Long, String)] = _
    private def idx: scala.collection.mutable.TreeSet[(Long, String)] = {
      if (idx0 == null) {
        idx0 = scala.collection.mutable.TreeSet.empty
        m.foreach { case (k, c) => idx0.add((c, k)) }
      }
      idx0
    }
    def bump(v: String, capacity: Int): Unit = m.get(v) match {
      case Some(c) =>
        m.update(v, c + 1L)
        if (idx0 != null) { idx0.remove((c, v)); idx0.add((c + 1L, v)) }
      case None if m.size < capacity =>
        m.update(v, 1L)
        if (idx0 != null) idx0.add((1L, v))
      case None => // evict the (count, key)-min; new item inherits its count
        val min = idx.head // same minimum `minBy { case (k, c) => (c, k) }` picked
        idx0.remove(min); m.remove(min._2)
        m.update(v, min._1 + 1L); idx0.add((min._1 + 1L, v))
    }
    /** Exact addition (see merge contract below); the index no longer
      * matches the shifted counts, so it is dropped for lazy rebuild. */
    def addAll(other: SpaceSavingBuf): Unit = {
      other.m.foreach { case (k, c) => m.update(k, m.getOrElse(k, 0L) + c) }
      idx0 = null
    }
  }

  /** SpaceSaving partial state / exact-addition merge (see object doc).
    * `finish` emits the candidate map; ranking happens after the exact
    * verify pass, not on sketch estimates. The buffer is MUTATED in place —
    * ObjectHashAggregate keeps it deserialized between rows, so the common
    * hit/insert path is O(1) amortized and eviction is O(log capacity)
    * via the buffer's sorted index. */
  final class SpaceSavingAgg(capacity: Int)
      extends Aggregator[String, SpaceSavingBuf, Map[String, Long]] {
    require(capacity > 0, "space_saving: capacity must be positive")
    type Buf = SpaceSavingBuf
    def zero: Buf = new SpaceSavingBuf
    def reduce(b: Buf, v: String): Buf = { b.bump(v, capacity); b }
    def merge(a: Buf, b: Buf): Buf = {
      // exact addition, NO truncation here: keeps the merge commutative and
      // associative (order-independent) at a bounded partitions×capacity size
      a.addAll(b)
      a
    }
    def finish(r: Buf): Map[String, Long] = r.m.toMap
    def bufferEncoder: Encoder[Buf] = org.apache.spark.sql.Encoders.kryo[Buf]
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** `top-hitters hint.strategy=sketch N of value` — sketch candidates, then
    * exact counts for candidates only (broadcast semi-join; the shuffle after
    * the map-side partial agg carries ≤capacity rows per partition). Output
    * matches Kusto's `approximate_count_<col>` vocabulary and, when every
    * true top-N value has frequency > n/capacity, the exact plan's rows. */
  def topHittersApprox(df: DataFrame, valueCol: String, n: Int,
      capacity: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // nulls are ignored (Kusto's top-hitters contract) — and MUST be: a null
    // key entering the sketch would NPE the (count, key) eviction order
    val vals = df.select(col(valueCol).cast("string").as("__v"))
      .where(col("__v").isNotNull)
    val sketch = vals.as[String]
      .select(new SpaceSavingAgg(capacity).toColumn).toDF("m")
    val cands = sketch.select(explode(map_keys(col("m"))).as("__v"))
    vals.join(broadcast(cands), "__v")
      .groupBy("__v").agg(count(lit(1)).as(s"approximate_count_$valueCol"))
      .orderBy(col(s"approximate_count_$valueCol").desc, col("__v").asc)
      .limit(n)
      .withColumnRenamed("__v", valueCol)
  }
}
