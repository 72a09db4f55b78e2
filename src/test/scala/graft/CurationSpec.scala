package graft

import org.apache.spark.sql.functions._
import graft.functions.{HostRank, Sampling}

/** Unit coverage for the round-12 curation batch: host PageRank,
  * temperature mixture, diversity selection, weighted sampling. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // --- HostRank.pageRank ----------------------------------------------------

  test("pageRank: hand-computed two-node chain, two iterations") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    val r1 = HostRank.pageRank(e, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a receives nothing: base = 150000; b receives a's full 1e6:
    // 150000 + 850*1000000/1000 = 1000000
    assert(r1 == Map("a" -> 150000L, "b" -> 1000000L))
    val r2 = HostRank.pageRank(e, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // iter2: a's rank is now 150000, so b = 150000 + 850*150000/1000
    assert(r2 == Map("a" -> 150000L, "b" -> 277500L))
  }

  test("pageRank: fan-out splits mass; multigraph edges count in outdeg") {
    val e = Seq(("a", "b"), ("a", "c")).toDF("src", "dst")
    val r = HostRank.pageRank(e, "src", "dst", iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // outdeg(a)=2 → each neighbor gets floor(1e6/2)=500000:
    assert(r("b") == 150000L + 850L * 500000L / 1000L)
    assert(r("c") == r("b"))
    // duplicated edge doubles the share to that neighbor
    val e2 = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("src", "dst")
    val r2 = HostRank.pageRank(e2, "src", "dst", iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r2("b") == 150000L + 850L * (2L * 333333L) / 1000L)
    assert(r2("c") == 150000L + 850L * 333333L / 1000L)
  }

  test("pageRank: in-degree skew ranks the hub first; deterministic rerun") {
    val edges = (0 until 40).map(i => (s"n$i", if (i % 2 == 0) "hub" else s"n${(i + 1) % 40}"))
      .toDF("src", "dst")
    val r = HostRank.pageRank(edges, "src", "dst", iters = 3)
    val top = r.orderBy(col("rank_micro").desc, col("node")).first().getString(0)
    assert(top == "hub")
    val again = HostRank.pageRank(edges, "src", "dst", iters = 3)
    assert(r.orderBy("node").collect().toSeq == again.orderBy("node").collect().toSeq)
  }

  test("pageRank: null-endpoint edges are dropped, not nodes") {
    val e = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None))
      .toDF("src", "dst")
    val r = HostRank.pageRank(e, "src", "dst", iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // only a->b survives: same result as the two-node chain
    assert(r == Map("a" -> 150000L, "b" -> 1000000L))
  }

  test("weightedSample: fractional weight types are rejected loudly") {
    val df = Seq((1L, 2.5)).toDF("id", "w")
    val e = intercept[IllegalArgumentException](
      Sampling.weightedSample(df, col("w"), col("id"), 1))
    assert(e.getMessage.contains("integral"))
  }

  test("pageRank: bounds enforced") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException](HostRank.pageRank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](HostRank.pageRank(e, "src", "dst", 51))
    intercept[IllegalArgumentException](HostRank.pageRank(e, "src", "dst", 3, 1001))
    intercept[IllegalArgumentException](
      HostRank.pageRank(e, "src", "dst", 3, checkpointEvery = 0))
  }

  test("pageRank: long chain — checkpoint barrier changes no values, bounds the plan") {
    val edges = (0 until 30).map(i => (s"n$i", if (i % 3 == 0) "hub" else s"n${(i + 7) % 30}"))
      .toDF("src", "dst")
    val chk = HostRank.pageRank(edges, "src", "dst", iters = 20, checkpointEvery = 5)
    val noChk = HostRank.pageRank(edges, "src", "dst", iters = 20, checkpointEvery = 100)
    assert(chk.orderBy("node").collect().toSeq == noChk.orderBy("node").collect().toSeq)
    // lineage depth is constant in iters: the analyzed plan holds at most
    // checkpointEvery unrolled iterations (2 joins each + the left join),
    // never the full 20 — the 100 TB long-chain posture
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.length
    assert(joins(chk) < joins(noChk) / 2,
      s"checkpointed plan has ${joins(chk)} joins vs ${joins(noChk)} unchecked")
    chk.unpersist(); noChk.unpersist()
  }

  test("applyMixtureRates: pre-existing ppm/internal columns are rejected loudly") {
    val rates = Sampling.temperatureRates(mixFixture, col("dom"), 2, 200L)
    val withPpm = mixFixture.withColumn("keep_ppm", lit(1L))
    val e1 = intercept[IllegalArgumentException](
      Sampling.applyMixtureRates(withPpm, col("dom"), col("id"), rates))
    assert(e1.getMessage.contains("keep_ppm"))
    val withDom = mixFixture.withColumn("__tm_dom", lit("x"))
    val e2 = intercept[IllegalArgumentException](
      Sampling.applyMixtureRates(withDom, col("dom"), col("id"), rates))
    assert(e2.getMessage.contains("__tm_dom"))
  }

  // --- quantileThresholds / assignBins (streaming bins) -----------------------

  test("assignBins: threshold closure reproduces quantileBins on distinct scores") {
    val pool = (0 until 100).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("id", "score") // distinct scores → closure is exact
    val th = Sampling.quantileThresholds(pool, col("score"), col("id"), 4)
    assert(th.length == 3 && th.sorted.sameElements(th))
    val rankBins = Sampling.quantileBins(pool, col("score"), col("id"), 4)
      .select("id", "bin").as[(Long, Int)].collect().toMap
    val thBins = pool.select(col("id"),
        Sampling.assignBins(col("score"), th).as("bin"))
      .as[(Long, Int)].collect().toMap
    assert(rankBins == thBins)
  }

  test("assignBins: boundary ties land in the higher bin; null score stays null; k=1") {
    // 8 rows, all score 5 except two: rank bins SPLIT the tie, thresholds
    // put every tied row in the bin whose lower bound is 5
    val pool = Seq((1L, 1L), (2L, 5L), (3L, 5L), (4L, 5L),
      (5L, 5L), (6L, 5L), (7L, 5L), (8L, 9L)).toDF("id", "score")
    val th = Sampling.quantileThresholds(pool, col("score"), col("id"), 2)
    assert(th.toSeq == Seq(5L)) // bin 1 starts at the tied score
    val bins = pool.select(col("id"),
        Sampling.assignBins(col("score"), th).as("bin"))
      .as[(Long, Int)].collect().toMap
    assert(bins(1L) == 0 && bins(8L) == 1)
    assert((2L to 7L).forall(bins(_) == 1)) // ALL tied rows → higher bin
    val withNull = Seq((1L, Some(3L)), (2L, None)).toDF("id", "score")
    val nb = withNull.select(col("id"),
        Sampling.assignBins(col("score"), th).as("bin")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(nb(1L) == Some(0) && nb(2L) == None)
    // k=1: no thresholds, everything bin 0
    val th1 = Sampling.quantileThresholds(pool, col("score"), col("id"), 1)
    assert(th1.isEmpty)
    assert(pool.select(Sampling.assignBins(col("score"), th1))
      .as[Int].collect().forall(_ == 0))
  }

  test("assignBins: sparse pool bins (n < k) keep quantileBins' skipped ids") {
    // 2 rows, k=4: quantileBins assigns bins 0 and 2 (indices SKIP);
    // the dense threshold fill must reproduce exactly that, and scores
    // above the pool max must cap at the pool's top occupied bin
    val pool = Seq((1L, 10L), (2L, 20L)).toDF("id", "score")
    val th = Sampling.quantileThresholds(pool, col("score"), col("id"), 4)
    assert(th.length == 3)
    val rankBins = Sampling.quantileBins(pool, col("score"), col("id"), 4)
      .select("id", "bin").as[(Long, Int)].collect().toMap
    val thBins = pool.select(col("id"),
        Sampling.assignBins(col("score"), th).as("bin"))
      .as[(Long, Int)].collect().toMap
    assert(rankBins == thBins && thBins == Map(1L -> 0, 2L -> 2))
    val above = Seq((9L, 999L)).toDF("id", "score")
      .select(Sampling.assignBins(col("score"), th)).as[Int].collect()
    assert(above.head == 2) // unreachable bin 3 stays unreachable
  }

  test("quantileThresholds: fractional score types are rejected loudly") {
    val pool = Seq((1L, 2.5)).toDF("id", "score")
    val e = intercept[IllegalArgumentException](
      Sampling.quantileThresholds(pool, col("score"), col("id"), 4))
    assert(e.getMessage.contains("integral"))
  }

  // --- Retrieval.rrf -----------------------------------------------------------

  test("rrf: fusion arithmetic, absent-list zeros, tie-break, topK cut") {
    import graft.functions.Retrieval
    val l1 = Seq(("a", 1), ("b", 2)).toDF("id", "rank")
    val l2 = Seq(("b", 1), ("c", 2)).toDF("id", "rank")
    val out = Retrieval.rrf(Seq(l1, l2), "id", "rank", topK = 3)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    // b in both lists: 1/62 + 1/61 beats a (1/61) beats c (1/62)
    assert(out.map(_._1) == Seq("b", "a", "c"))
    assert(out.head._2 == 1.0 / 62 + 1.0 / 61)
    assert(out(1)._2 == 1.0 / 61 && out(2)._2 == 1.0 / 62)
    val cut = Retrieval.rrf(Seq(l1, l2), "id", "rank", topK = 1)
      .collect().map(_.getString(0)).toSeq
    assert(cut == Seq("b"))
    // equal rrf ties break by id: two docs each only in one list at rank 1
    val t1 = Seq(("x", 1)).toDF("id", "rank")
    val t2 = Seq(("w", 1)).toDF("id", "rank")
    val tied = Retrieval.rrf(Seq(t1, t2), "id", "rank", topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(tied == Seq("w", "x"))
  }

  test("rrf: weighted fusion scales each list's contribution; arity checked") {
    import graft.functions.Retrieval
    val l1 = Seq(("a", 1), ("b", 2)).toDF("id", "rank")
    val l2 = Seq(("b", 1), ("c", 2)).toDF("id", "rank")
    val out = Retrieval.rrf(Seq(l1, l2), "id", "rank", topK = 3,
        weights = Seq(2.0, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    // b: 2/62 + 1/61; a: 2/61; c: 1/62 — each term ONE division, replayable
    assert(out.map(_._1) == Seq("b", "a", "c"))
    assert(out.head._2 == 2.0 / 62 + 1.0 / 61)
    assert(out(1)._2 == 2.0 / 61 && out(2)._2 == 1.0 / 62)
    // weights must match list arity
    intercept[IllegalArgumentException] {
      Retrieval.rrf(Seq(l1, l2), "id", "rank", topK = 1, weights = Seq(1.0))
    }
    // 3-list fusion: the n-ary join chain carries every per-list rank
    val l3 = Seq(("a", 1)).toDF("id", "rank")
    val three = Retrieval.rrf(Seq(l1, l2, l3), "id", "rank", topK = 3)
      .collect().map(r => (r.getString(0), r.getDouble(4))).toSeq
    assert(three.head._1 == "a") // 1/61 + 1/61 beats b's 1/62 + 1/61
    assert(three.head._2 == 1.0 / 61 + 1.0 / 61)
  }

  test("pageRankConverged: early stop at the integer fixpoint equals fixed-iters") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    // chain fixpoint after iteration 2 (a fixed at base from iter 1,
    // b = base + 850·base/1000 from iter 2 on)
    val (conv, itersRun) = HostRank.pageRankConverged(e, "src", "dst",
      maxIters = 20, checkpointEvery = 1)
    assert(itersRun < 20, s"no early stop: ran $itersRun")
    val fixed = HostRank.pageRank(e, "src", "dst", iters = 20)
    assert(conv.orderBy("node").collect().toSeq ==
      fixed.orderBy("node").collect().toSeq)
    // non-trivial graph: converged result still equals the fixed-iters run
    val edges = (0 until 20).map(i => (s"n$i", s"n${(i + 1) % 20}")).toDF("src", "dst")
    val (c2, i2) = HostRank.pageRankConverged(edges, "src", "dst",
      maxIters = 30, checkpointEvery = 2)
    // symmetric cycle: every node keeps rank 1e6 — fixpoint at the first probe
    assert(i2 == 2, s"cycle should converge at the first boundary, ran $i2")
    assert(c2.orderBy("node").collect().toSeq ==
      HostRank.pageRank(edges, "src", "dst", iters = 30).orderBy("node")
        .collect().toSeq)
  }

  // --- NgramQuality: planted separable-vocabulary contract --------------------

  test("ngram classifier: disjoint vocabularies separate; held-out docs classify correctly") {
    import graft.functions.NgramQuality
    // two DISJOINT vocabularies → every feature is class-pure evidence;
    // train on even ids, score all: held-out odd ids must classify by
    // vocabulary, not memorization
    val posVocab = Seq("aurora", "borealis", "quasar", "nebula")
    val negVocab = Seq("mud", "sludge", "grit", "rust")
    def doc(i: Int, v: Seq[String]) =
      (0 until 12).map(j => v((i + j) % v.size)).mkString(" ")
    val rows = (0 until 40).map { i =>
      val pos = i % 2 == 0 // even ids positive — BOTH parities in both splits
      (i.toLong, if (pos) doc(i, posVocab) else doc(i, negVocab), pos)
    }
    val df = rows.toDF("doc_id", "text", "is_pos")
    val out = NgramQuality.classify(df, "text", "doc_id",
        df.where(col("doc_id") < 20), col("is_pos"))
      .collect().map(r => r.getLong(0) -> (r.getInt(4) == 1)).toMap
    assert(out.size == 40)
    rows.foreach { case (id, _, pos) =>
      assert(out(id) == pos, s"doc $id misclassified (expected pos=$pos)")
    }
  }

  test("ngram classifier: empty labeled slice fails loudly at trainModel") {
    import graft.functions.NgramQuality
    val empty = Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "is_pos")
    val e = intercept[IllegalArgumentException](
      NgramQuality.trainModel(empty, "text", col("is_pos")))
    assert(e.getMessage.contains("no features"))
  }

  test("ngram classifier: dense literal model equals the batch join chain exactly") {
    import graft.functions.{NgramQuality, TextAnalysis}
    val labeled = Seq(
      (1L, "alpha beta gamma", true), (2L, "beta gamma delta", true),
      (3L, "mud rust grit", false), (4L, "rust sludge mud", false))
      .toDF("doc_id", "text", "is_pos")
    // corpus mixes labeled-seen and labeled-UNSEEN tokens — the dense
    // model's default entries must equal the left-join + coalesce path
    val corpus = Seq((10L, "alpha mud zz9"), (11L, "gamma gamma qq7 beta"),
      (12L, "totally unseen words here")).toDF("doc_id", "text")
    val batch = NgramQuality.classify(corpus, "text", "doc_id",
        labeled, col("is_pos"))
      .select("id", "logit_micro").as[(Long, Long)].collect().toMap
    val model = NgramQuality.trainModel(labeled, "text", col("is_pos"))
    val lit = corpus.select(col("doc_id"),
        NgramQuality.scoreMicro(
          TextAnalysis.tokens(lower(col("text"))), model).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(batch == lit, s"batch $batch vs literal $lit")
  }

  test("ngram classifier: prior dominates a doc of only unseen tokens") {
    import graft.functions.NgramQuality
    // labeled slice is 3:1 positive; a scored doc whose every token is
    // labeled-unseen gets n_feats × the symmetric default weight + prior.
    // The default is ln((C0+aB)/(C1+aB)) per feature — slightly NEGATIVE
    // here (more positive training mass), so the sign is an exact integer
    // prediction we can replay in scala
    val labeled = Seq(
      (1L, "alpha beta gamma delta", true),
      (2L, "alpha gamma beta alpha", true),
      (3L, "beta delta gamma beta", true),
      (4L, "omega psi chi phi", false)).toDF("doc_id", "text", "is_pos")
    val scored = NgramQuality.classify(
      Seq((99L, "zz1 zz2 zz3")).toDF("doc_id", "text"), "text", "doc_id",
      labeled, col("is_pos"))
    val r = scored.collect().head
    val nf = r.getLong(1)
    assert(nf == 5L) // 3 unigrams + 2 bigrams
    // replay: every bucket unseen → wq0 each; prior ln(3.5/1.5)
    val aB = 0.5 * 4096
    // training feature mass: 3 pos docs x (4 uni + 3 bi) = 21; 1 neg doc x 7
    val t1 = 21.0; val t0 = 7.0
    val wq0 = BigDecimal((math.log(0.5 / (t1 + aB)) - math.log(0.5 / (t0 + aB))) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val pq = BigDecimal((math.log(3 + 0.5) - math.log(1 + 0.5)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(r.getLong(2) == nf * wq0 + pq,
      s"logit_micro ${r.getLong(2)} != ${nf * wq0 + pq}")
  }

  // --- Sampling.temperatureMixture -------------------------------------------

  private def mixFixture = (0 until 400).map { i =>
    val dom = if (i < 300) "big" else if (i < 380) "mid" else "small"
    (i.toLong, dom)
  }.toDF("id", "dom")

  test("temperatureMixture: alpha<1 keeps a higher fraction of small domains") {
    val rates = Sampling.temperatureMixture(mixFixture, col("dom"), col("id"),
        alphaQuarters = 2, budget = 200L)
      .groupBy("dom").agg(first("keep_ppm").as("ppm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate ∝ n^0.5/n = n^-0.5: strictly decreasing in domain size
    assert(rates("small") > rates("mid") && rates("mid") > rates("big"))
  }

  test("temperatureMixture: alpha=1 is proportional (uniform rate across domains)") {
    val kept = Sampling.temperatureMixture(mixFixture, col("dom"), col("id"),
      alphaQuarters = 4, budget = 200L)
    val ppms = kept.select("keep_ppm").distinct().collect().map(_.getLong(0))
    assert(ppms.length == 1) // n^1/n is constant → one global rate
    // budget/total = 0.5 → ppm = floor(0.5 * 2^24)
    assert(ppms.head == 8388608L)
  }

  test("temperatureMixture: null domains carry no weight (rates as if absent)") {
    val withNulls = mixFixture
      .union(Seq.fill(400)((999L, Option.empty[String])).zipWithIndex
        .map { case ((_, d), i) => (1000L + i, d) }.toDF("id", "dom"))
    val clean = Sampling.temperatureMixture(mixFixture, col("dom"), col("id"),
        2, 200L).groupBy("dom").agg(first("keep_ppm").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val noisy = Sampling.temperatureMixture(withNulls, col("dom"), col("id"),
        2, 200L).groupBy("dom").agg(first("keep_ppm").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean == noisy) // 50% null-domain rows must not deflate real rates
  }

  test("temperatureMixture: budget 0 keeps nothing; huge budget keeps everything") {
    assert(Sampling.temperatureMixture(mixFixture, col("dom"), col("id"), 2, 0L).count() == 0L)
    assert(Sampling.temperatureMixture(mixFixture, col("dom"), col("id"), 2,
      1000000L).count() == 400L)
  }

  // --- Sampling.budgetWaterfill ------------------------------------------------

  test("budgetWaterfill: equal weights below caps split the budget evenly") {
    val doms = Seq(("a", 100L, 1L), ("b", 100L, 1L)).toDF("d", "n", "w")
    val r = Sampling.budgetWaterfill(doms, col("d"), col("n"), col("w"),
        capMilli = 2000, budget = 300L)
      .collect().map(x => x.getString(0) -> (x.getLong(3), x.getLong(4))).toMap
    assert(r == Map("a" -> (150L, 1500L), "b" -> (150L, 1500L)))
  }

  test("budgetWaterfill: capped domain frees budget for the uncapped (hand-computed)") {
    val doms = Seq(("a", 50L, 9L), ("b", 1000L, 1L)).toDF("d", "n", "w")
    val r = Sampling.budgetWaterfill(doms, col("d"), col("n"), col("w"),
        capMilli = 2000, budget = 1000L)
      .collect().map(x => x.getString(0) -> (x.getLong(3), x.getLong(4))).toMap
    // round 1: a wants 900, caps at 2 epochs = 100; b gets 100.
    // round 2: the freed 800 all flows to b (the only uncapped domain).
    assert(r == Map("a" -> (100L, 2000L), "b" -> (900L, 900L)))
  }

  test("budgetWaterfill: never oversubscribes; all-capped leftover stays unallocated") {
    val doms = Seq(("a", 10L, 1L), ("b", 10L, 1L)).toDF("d", "n", "w")
    val r = Sampling.budgetWaterfill(doms, col("d"), col("n"), col("w"),
        capMilli = 1000, budget = 1000L)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r == Map("a" -> 10L, "b" -> 10L)) // 980 tokens stay on the table
    assert(Sampling.budgetWaterfill(doms, col("d"), col("n"), col("w"),
      2000, 0L).collect().map(_.getLong(3)).forall(_ == 0L))
  }

  test("budgetWaterfill: non-positive domains excluded; fractional types rejected") {
    val doms = Seq(("a", 100L, 1L), ("z", 0L, 5L), ("y", 50L, 0L)).toDF("d", "n", "w")
    val kept = Sampling.budgetWaterfill(doms, col("d"), col("n"), col("w"),
      2000, 100L).select("dom").collect().map(_.getString(0)).toSet
    assert(kept == Set("a"))
    val bad = Seq(("a", 1.5, 1L)).toDF("d", "n", "w")
    intercept[IllegalArgumentException](
      Sampling.budgetWaterfill(bad, col("d"), col("n"), col("w"), 2000, 100L))
  }

  // --- Sampling.blockPack ----------------------------------------------------------

  test("blockPack: every block is exactly blockSize tokens except the last") {
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 4L), (4L, 7L)).toDF("id", "tok")
    val segs = Sampling.blockPack(docs, col("tok"), col("id"), 8L)
    val perBlock = segs.groupBy("block").agg(sum("seg_tokens").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 25 tokens → blocks 0,1,2 of 8 + block 3 of 1
    assert(perBlock == Map(0L -> 8L, 1L -> 8L, 2L -> 8L, 3L -> 1L))
    // doc 2 (start 5, end 14) spans blocks 0 and 1: 3 + 6 tokens
    val d2 = segs.filter(col("id") === 2L).orderBy("block")
      .select("block", "seg_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(d2 == Seq((0L, 3L), (1L, 6L)))
    // total segment tokens = total doc tokens (nothing lost or duplicated)
    assert(segs.agg(sum("seg_tokens")).collect().head.getLong(0) == 25L)
  }

  test("blockPack: a custom order packs in training order, not id order") {
    val docs = Seq((1L, 4L, 3L), (2L, 4L, 1L), (3L, 4L, 2L)).toDF("id", "tok", "rank")
    val segs = Sampling.blockPack(docs, col("tok"), col("id"), 8L,
        order = Seq(col("rank")))
      .orderBy("block", "rank").select("id", "block").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // rank order 2,3,1: docs 2 and 3 fill block 0; doc 1 is block 1
    assert(segs == Seq((2L, 0L), (3L, 0L), (1L, 1L)))
  }

  test("blockPack: a doc longer than several blocks splits into each; empties drop") {
    val docs = Seq((1L, 20L), (2L, 0L)).toDF("id", "tok")
      .union(Seq((3L, Option.empty[Long])).toDF("id", "tok"))
    val segs = Sampling.blockPack(docs, col("tok"), col("id"), 6L)
    assert(segs.filter(col("id") =!= 1L).count() == 0L)
    val spans = segs.orderBy("block").select("block", "seg_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(spans == Seq((0L, 6L), (1L, 6L), (2L, 6L), (3L, 2L)))
  }

  // --- Sampling.ratioInterleave --------------------------------------------------

  test("ratioInterleave: 3:1 ratio yields the exact aaab stride pattern") {
    val df = ((0L until 30L).map((_, "a")) ++ (100L until 110L).map((_, "b")))
      .toDF("id", "src")
    val order = Sampling.ratioInterleave(df, col("src"), col("id"),
        Map("a" -> 3, "b" -> 1))
      .orderBy("pos").select("src").collect().map(_.getString(0))
    assert(order.length == 40)
    // stride scheduling: every window of 4 is exactly three a's and one b
    order.grouped(4).foreach(g => assert(g.count(_ == "a") == 3 && g.count(_ == "b") == 1,
      s"bad window: ${g.mkString(",")}"))
  }

  test("ratioInterleave: prefix counts stay within one stride of the ratio") {
    val df = ((0L until 60L).map((_, "x")) ++ (100L until 140L).map((_, "y")))
      .toDF("id", "src")
    val order = Sampling.ratioInterleave(df, col("src"), col("id"),
        Map("x" -> 3, "y" -> 2))
      .orderBy("pos").select("src").collect().map(_.getString(0))
    var nx = 0
    order.zipWithIndex.foreach { case (s, i) =>
      if (s == "x") nx += 1
      val expect = (i + 1) * 3.0 / 5.0
      assert(math.abs(nx - expect) <= 2.0, s"prefix ${i + 1}: $nx x's vs $expect")
    }
  }

  test("ratioInterleave: unlisted and zero-ratio sources drop; guards fire") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "src")
    val kept = Sampling.ratioInterleave(df, col("src"), col("id"),
        Map("a" -> 1, "b" -> 0))
      .select("src").collect().map(_.getString(0)).toSet
    assert(kept == Set("a"))
    intercept[IllegalArgumentException](
      Sampling.ratioInterleave(df, col("src"), col("id"), Map.empty))
    intercept[IllegalArgumentException](
      Sampling.ratioInterleave(df, col("src"), col("id"), Map("a" -> -1)))
  }

  // --- Sampling.epochExpand ------------------------------------------------------

  private def docsFixture = (0L until 40L).map { i =>
    (i, if (i < 30) "big" else "small")
  }.toDF("id", "dom")

  test("epochExpand: full epochs replicate exactly; zero allocation drops the domain") {
    val alloc = Seq(("big", 2000L), ("small", 0L)).toDF("dom", "epochs_milli")
    val out = Sampling.epochExpand(docsFixture, col("dom"), col("id"), alloc)
    assert(out.filter(col("dom") === "small").count() == 0L)
    val big = out.filter(col("dom") === "big")
    assert(big.count() == 60L) // 30 docs x 2 full epochs
    assert(big.groupBy("id").count().filter(col("count") =!= 2).count() == 0L)
    assert(big.select("epoch").distinct().collect().map(_.getLong(0)).sorted
      .toSeq == Seq(0L, 1L))
  }

  test("epochExpand: fractional epoch keeps a deterministic hash subset") {
    val alloc = Seq(("big", 1500L)).toDF("dom", "epochs_milli")
    val out = Sampling.epochExpand(docsFixture, col("dom"), col("id"), alloc)
    val perEpoch = out.groupBy("epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perEpoch(0L) == 30L) // the full epoch has everyone
    assert(perEpoch.getOrElse(1L, 0L) > 0L && perEpoch(1L) < 30L) // ~half
    val again = Sampling.epochExpand(docsFixture, col("dom"), col("id"), alloc)
    assert(out.orderBy("id", "epoch").collect().toSeq ==
      again.orderBy("id", "epoch").collect().toSeq)
  }

  test("epochExpand: purely fractional allocation is a sub-epoch subset at epoch 0") {
    val alloc = Seq(("big", 400L), ("small", 400L)).toDF("dom", "epochs_milli")
    val out = Sampling.epochExpand(docsFixture, col("dom"), col("id"), alloc)
    assert(out.select("epoch").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
    val n = out.count()
    assert(n > 0L && n < 40L)
  }

  // --- Sampling.diverseSelect -------------------------------------------------

  private def clusterFixture = Seq(
    (1L, "a", 10L), (2L, "a", 9L), (3L, "a", 8L),
    (4L, "b", 100L), (5L, "b", 1L),
    (6L, "c", 5L)).toDF("id", "cl", "score")

  test("diverseSelect: first picks cover every cluster before any repeat") {
    val picks = Sampling.diverseSelect(clusterFixture, col("cl"), col("score"),
        col("id"), 4)
      .orderBy("pick").select("id", "cl", "pick").collect()
    // round 1 = best of each cluster, ordered by (score desc, id):
    // b/4 (100), a/1 (10), c/6 (5); round 2 starts with a/2 (9)
    assert(picks.map(_.getLong(0)).toSeq == Seq(4L, 1L, 6L, 2L))
    assert(picks.take(3).map(_.getString(1)).toSet == Set("a", "b", "c"))
  }

  test("diverseSelect: k beyond n returns all rows; k=0 none") {
    assert(Sampling.diverseSelect(clusterFixture, col("cl"), col("score"),
      col("id"), 100).count() == 6L)
    assert(Sampling.diverseSelect(clusterFixture, col("cl"), col("score"),
      col("id"), 0).count() == 0L)
  }

  // --- Sampling.weightedSample -------------------------------------------------

  test("weightedSample: non-positive and null weights are never sampled") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -2L), (4L, 3L)).toDF("id", "w")
      .union(Seq((5L, Option.empty[Long])).toDF("id", "w"))
    val got = Sampling.weightedSample(df, col("w"), col("id"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("weightedSample: equal weights reduce to the pure hash order") {
    val df = (0L until 50L).toDF("id").withColumn("w", lit(7L))
    val a = Sampling.weightedSample(df, col("w"), col("id"), 10)
      .orderBy("pick").select("id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedSample(df.withColumn("w", lit(3L)), col("w"),
        col("id"), 10)
      .orderBy("pick").select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b) // scaling all weights equally cannot change the order
  }

  test("weightedSample: heavier rows win overwhelmingly often") {
    // 200 light rows (w=1) + 20 heavy rows (w=1000): a 20-draw should be
    // dominated by heavy ids (each heavy row carries 5x the TOTAL light mass)
    val df = ((0L until 200L).map((_, 1L)) ++ (1000L until 1020L).map((_, 1000L)))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, col("w"), col("id"), 20)
      .select("id").collect().map(_.getLong(0))
    assert(got.count(_ >= 1000L) >= 15)
  }

  test("TopKAgg: reservoir keeps the k best, merge is order-independent and bounded") {
    val agg = new Sampling.TopKAgg(3)
    val items = Seq((0.5, 7L), (0.9, 2L), (0.9, 1L), (0.1, 9L), (0.7, 4L))
    val r = items.foldLeft(agg.zero)(agg.reduce)
    assert(r == Seq((0.9, 1L), (0.9, 2L), (0.7, 4L))) // key desc, id asc ties
    // merge of two partial reservoirs = reservoir of the concatenation
    val (a, b) = items.splitAt(2)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    assert(merged == r)
    assert(agg.merge(r, r).size == 3) // bounded under self-merge
    // union of shard reservoirs contains the global top-k (exactness of the
    // read-side cut): every element of the global top-3 is in some shard's top-3
    val shards = items.groupBy(_._2 % 2).values.toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    assert(r.toSet.subsetOf(shards.flatten.toSet))
  }

  test("weightedSample: deterministic across reruns and k-prefix-stable") {
    val df = (0L until 100L).toDF("id")
      .withColumn("w", (col("id") % 9L) + 1L)
    val k10 = Sampling.weightedSample(df, col("w"), col("id"), 10)
      .orderBy("pick").select("id").collect().map(_.getLong(0)).toSeq
    val k5 = Sampling.weightedSample(df, col("w"), col("id"), 5)
      .orderBy("pick").select("id").collect().map(_.getLong(0)).toSeq
    assert(k10.take(5) == k5) // A-Res: smaller draws are prefixes of larger
    val again = Sampling.weightedSample(df, col("w"), col("id"), 10)
      .orderBy("pick").select("id").collect().map(_.getLong(0)).toSeq
    assert(k10 == again)
  }
}
