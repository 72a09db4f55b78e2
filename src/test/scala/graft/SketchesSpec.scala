package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** Bloom / count-min sketch contracts: the pre-filter guarantees that make
  * sketch-then-exact-verify pipelines EXACT (no false negatives / never
  * under-counts), plus merge associativity — the properties the 100 TB
  * posture rests on. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (0L until 500L).map(i => i * 7 + 1)
  private lazy val keyDf = keys.toDF("k")

  test("bloom: zero false negatives; merge of halves equals whole") {
    val bf = keyDf.agg(Sketches.bloomAgg(col("k"), 8192, 3).as("bf"))
    val misses = keyDf.crossJoin(broadcast(bf))
      .where(!Sketches.bloomContains(col("bf"), col("k"), 3)).count()
    assert(misses == 0, "a Bloom filter must never reject an inserted key")

    // merged per-shard filters answer identically to the monolithic build
    val halves = keyDf.withColumn("s", col("k") % 2)
      .groupBy("s").agg(Sketches.bloomAgg(col("k"), 8192, 3).as("bf"))
    val merged = halves.agg(Sketches.bloomMerge(col("bf")).as("bf"))
    val whole = bf.as[Array[Long]].head().toSeq
    assert(merged.as[Array[Long]].head().toSeq == whole)
  }

  test("bloom: false-positive rate stays near the design point") {
    val bf = keyDf.agg(Sketches.bloomAgg(col("k"), 8192, 3).as("bf"))
    // 2000 keys guaranteed not inserted (inserted keys are ≡1 mod 7)
    val probes = (0L until 2000L).map(i => i * 7 + 3).toDF("k")
    val fp = probes.crossJoin(broadcast(bf))
      .where(Sketches.bloomContains(col("bf"), col("k"), 3)).count()
    // n=500, m=8192, k=3 → theoretical fpr ≈ 0.45%; allow generous slack
    assert(fp.toDouble / 2000 < 0.05, s"fpr ${fp.toDouble / 2000} too high")
  }

  test("cms: estimate never under-counts and is exact without collisions") {
    val rows = Seq.tabulate(600)(i => i % 20).toDF("k") // keys 0..19, 30 each
    val cms = rows.agg(Sketches.cmsAgg(col("k"), 128, 3).as("cms"))
    val est = rows.distinct().crossJoin(broadcast(cms))
      .select(col("k"), Sketches.cmsEstimate(col("cms"), col("k"), 128, 3).as("e"))
      .as[(Int, Long)].collect().toMap
    (0 until 20).foreach(k => assert(est(k) >= 30L, s"under-count at $k"))
    // 20 keys in 128 buckets × 3 rows: at least one collision-free row is
    // overwhelmingly likely, making min() exact — assert it holds here
    assert(est.values.forall(_ == 30L))
  }

  test("sketch width does not inflate the plan: 2^17-bit bloom builds, one partial+final object aggregate") {
    // With per-word column aggregates this would be 2048 aggregate
    // expressions and a codegen blowup; the long-array buffer makes width
    // free. Smoke the build AND assert the plan shape.
    val wide = keyDf.agg(Sketches.bloomAgg(col("k"), 1 << 17, 3).as("bf"))
    assert(wide.as[Array[Long]].head().length == (1 << 17) / 64)
    val p = wide.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected object aggregate:\n$p")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      s"expected exactly partial+final aggregate stages:\n$p")
    // no false negatives at full width either
    val misses = keyDf.crossJoin(broadcast(wide))
      .where(!Sketches.bloomContains(col("bf"), col("k"), 3)).count()
    assert(misses == 0)
    // and a wide CMS (d*w = 3*2^15 counters) builds the same way
    val wideCms = keyDf.agg(Sketches.cmsAgg(col("k"), 1 << 15, 3).as("cms"))
    assert(wideCms.as[Array[Long]].head().length == 3 * (1 << 15))
  }

  test("cms: merged shard sketches add exactly") {
    val rows = Seq.tabulate(600)(i => i % 20).toDF("k")
    val shards = rows.withColumn("s", col("k") % 3)
      .groupBy("s").agg(Sketches.cmsAgg(col("k"), 128, 3).as("cms"))
    val merged = shards.agg(Sketches.cmsMerge(col("cms")).as("cms"))
    val whole = rows.agg(Sketches.cmsAgg(col("k"), 128, 3).as("cms"))
    assert(merged.as[Array[Long]].head().toSeq ==
      whole.as[Array[Long]].head().toSeq)
  }
}
