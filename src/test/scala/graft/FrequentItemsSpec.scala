package graft

import graft.functions.FrequentItems
import graft.functions.FrequentItems.SpaceSavingAgg
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("SpaceSaving reduce: bounded state, deterministic (count,key)-min eviction") {
    val agg = new SpaceSavingAgg(2)
    val st = agg.finish(Seq("a", "b", "c", "a").foldLeft(agg.zero)(agg.reduce))
    // a:1, b:1 fill capacity; c evicts the (1,"a") min and inherits → c:2;
    // a evicts the (1,"b") min → a:2
    assert(st == Map("c" -> 2L, "a" -> 2L))
    assert(st.size <= 2)
    // overestimate-only: every kept counter ≥ the item's true count
    val trueCounts = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
    st.foreach { case (k, c) => assert(c >= trueCounts(k)) }
  }

  test("SpaceSaving merge is exact addition — commutative, no truncation") {
    val agg = new SpaceSavingAgg(2)
    def buf(kv: (String, Long)*) = {
      val b = agg.zero; b.m ++= kv; b
    }
    val ab = agg.merge(buf("x" -> 5L, "y" -> 3L), buf("y" -> 2L, "z" -> 7L))
    assert(ab.m == buf("x" -> 5L, "y" -> 5L, "z" -> 7L).m)
    assert(ab.m == agg.merge(buf("y" -> 2L, "z" -> 7L), buf("x" -> 5L, "y" -> 3L)).m)
  }

  test("SpaceSaving eviction is identical after a serialization round trip") {
    // kryo drops the transient (count,key) index — the rebuilt index must
    // pick the same eviction victim as an uninterrupted buffer
    val agg = new SpaceSavingAgg(3)
    def runWithSnapshot(snapshotAt: Int): Map[String, Long] = {
      val stream = Seq("b", "a", "c", "a", "d", "e", "b", "f")
      var b = agg.zero
      stream.zipWithIndex.foreach { case (v, i) =>
        if (i == snapshotAt) {
          // Java round trip drops the transient index exactly like the
          // kryo buffer encoder does at a shuffle boundary
          val bos = new java.io.ByteArrayOutputStream()
          val oos = new java.io.ObjectOutputStream(bos)
          oos.writeObject(b); oos.close()
          b = new java.io.ObjectInputStream(
            new java.io.ByteArrayInputStream(bos.toByteArray))
            .readObject().asInstanceOf[graft.functions.FrequentItems.SpaceSavingBuf]
        }
        b = agg.reduce(b, v)
      }
      agg.finish(b)
    }
    val plain = runWithSnapshot(-1)
    (0 until 8).foreach { at =>
      assert(runWithSnapshot(at) == plain, s"divergence when snapshotted at $at")
    }
  }

  test("topHittersApprox matches the exact top-N on skewed data at lossy capacity") {
    // Zipf-ish: value i appears ceil(600/i) times for i in 1..40 → 40 distinct,
    // capacity 8 is genuinely lossy, the top 3 clear the n/capacity bound
    val rows = (1 to 40).flatMap(i => Seq.fill(600 / i + 1)(f"v$i%02d"))
    val df = rows.toDF("k")
    val approx = FrequentItems.topHittersApprox(df, "k", 3, capacity = 8)
      .as[(String, Long)].collect().toSeq
    val exact = df.groupBy("k").count()
      .orderBy(col("count").desc, col("k").asc).limit(3)
      .as[(String, Long)].collect().toSeq
    assert(approx == exact, s"approx $approx != exact $exact")
  }

  test("topHittersApprox ignores nulls past the eviction capacity") {
    // nulls + more distinct keys than capacity: the null key must never
    // enter the sketch (a null in the (count, key) eviction order NPEs)
    val df = ((0 until 400).map(i => s"k${i % 40}") ++ Seq.fill(50)(null))
      .toDF("k")
    val top = FrequentItems.topHittersApprox(df, "k", 5, capacity = 8)
      .as[(String, Long)].collect().toSeq
    assert(top.size == 5 && top.forall(_._1 != null))
  }
}
