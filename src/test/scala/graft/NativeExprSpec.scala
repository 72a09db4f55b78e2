package graft

import org.apache.spark.sql.functions._
import graft.plans.NativeExpressions
import graft.sources.Tables

/** Native Catalyst expressions (DotF32, SimHash64): registered through
  * SparkSessionExtensions, bit-identical to the higher-order-function fallbacks
  * they replace, and evaluated inside codegen (not CodegenFallback). */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("extension functions are registered in the session") {
    assert(spark.catalog.functionExists(NativeExpressions.dotName))
    assert(spark.catalog.functionExists(NativeExpressions.simhashName))
  }

  test("native dot matches the HOF fold bit-for-bit on fixture embeddings") {
    val emb = Tables.load(spark, sf, "embeddings").limit(100)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib")).limit(500)
    val hof = aggregate(zip_with(col("va"), col("vb"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val native = call_function(NativeExpressions.dotName, col("va"), col("vb"))
    val diff = pairs.select((hof === native).as("same")).filter(!col("same")).count()
    assert(diff == 0)
  }

  test("native simhash matches the per-bit fold on fixture documents") {
    val docs = Tables.load(spark, sf, "documents").limit(100)
      .select(col("doc_id"),
        transform(split(lower(col("text")), " "), t => xxhash64(t)).as("h"))
    val n = size(col("h"))
    val bitCounts = transform(sequence(lit(0), lit(63)),
      i => aggregate(col("h"), lit(0L),
        (acc, x) => acc + call_function("shiftrightunsigned", x, i).bitwiseAND(lit(1L))))
    val hof = aggregate(zip_with(bitCounts, sequence(lit(0), lit(63)),
      (c, i) => when(c * 2 > n, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
    val native = call_function(NativeExpressions.simhashName, col("h"))
    val diff = docs.select((hof === native).as("same")).filter(!col("same")).count()
    assert(diff == 0)
  }

  test("native hyperplane projections match the typedlit HOF fold") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    val dimWeights = typedlit((0 until 64).map(d =>
      (0 until 24).map(p => graft.plans.NativeExpressions.planeComponent(p, d, 42L))))
    val hof = aggregate(
      zip_with(col("embedding"), dimWeights,
        (x, w) => transform(w, wp => x.cast("double") * wp)),
      array_repeat(lit(0.0), 24),
      (acc, contrib) => zip_with(acc, contrib, (a, c) => a + c))
    val native = call_function(NativeExpressions.hyperplanesName,
      col("embedding"), lit(64), lit(24), lit(42L))
    val rows = emb.select(hof.as("a"), native.as("b"))
      .as[(Seq[Double], Seq[Double])].collect()
    assert(rows.forall { case (a, b) => a == b })
  }

  test("native dot runs inside WholeStageCodegen") {
    val emb = Tables.load(spark, sf, "embeddings")
    val plan = emb.select(call_function(NativeExpressions.dotName,
        col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString()
    // the "*(n)" prefix marks operators compiled into a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dot_f32") && l.trim.startsWith("*(")), plan)
  }

  test("native and HOF fallback agree on null elements and unequal lengths") {
    // the edge inputs where the two paths could diverge: null elements (native
    // skips; fallback folds coalesce(·, 0)) and unequal lengths (native
    // truncates to the shorter array; zip_with pads with nulls → coalesced to 0)
    val df = Seq(
      (Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](2f, 5f, 4f)),
      (Seq[java.lang.Float](1f, 2f, 3f), Seq[java.lang.Float](10f)),
      (Seq[java.lang.Float](null, null), Seq[java.lang.Float](1f, 1f))
    ).toDF("a", "b")
    val rows = df.select(
      graft.functions.Similarity.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + coalesce(v, lit(0.0))).as("hof"))
      .as[(Double, Double)].collect()
    assert(rows.forall { case (n, h) => n == h }, rows.toSeq.toString)
    assert(rows.map(_._1).toSeq == Seq(1.0 * 2 + 3 * 4, 10.0, 0.0))

    // simhash: null hashes cast no vote and the majority denominator counts
    // non-null elements only — both paths
    val hs = Seq(
      Seq[java.lang.Long](3L, null, 3L),
      Seq[java.lang.Long](null, null),
      Seq[java.lang.Long](1L, 3L, null, 3L)
    ).toDF("h")
    val n = size(filter(col("h"), x => x.isNotNull))
    val bitCounts = transform(sequence(lit(0), lit(63)),
      i => aggregate(col("h"), lit(0L),
        (acc, x) => acc + coalesce(
          call_function("shiftrightunsigned", x, i).bitwiseAND(lit(1L)), lit(0L))))
    val hof = aggregate(zip_with(bitCounts, sequence(lit(0), lit(63)),
      (c, i) => when(c * 2 > n, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
    val out = hs.select(
      call_function(NativeExpressions.simhashName, col("h")).as("native"), hof.as("hof"))
      .as[(Long, Long)].collect()
    assert(out.forall { case (a, b) => a == b }, out.toSeq.toString)
    assert(out.map(_._1).toSeq == Seq(3L, 0L, 3L))
  }

  test("empty and null-element arrays evaluate safely") {
    val df = Seq(
      (Array.empty[Float], Array.empty[Float]),
      (Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
    val r = df.select(call_function(NativeExpressions.dotName, col("a"), col("b")))
      .as[Double].collect()
    assert(r.toSeq == Seq(0.0, 11.0))
    val s = Seq(Seq(3L), Seq.empty[Long]).toDF("h")
      .select(call_function(NativeExpressions.simhashName, col("h")))
      .as[Long].collect()
    assert(s.toSeq == Seq(3L, 0L))
  }
}
