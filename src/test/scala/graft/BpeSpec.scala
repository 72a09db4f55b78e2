package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the classic merges on a textbook corpus") {
    // Sennrich's running example shape: {low, lower, newest, widest}
    val merges = Bpe.train(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 4)
    // 'es' (9) then 'est' (9) dominate, then 'lo' (7), then 'low' (7)
    assert(merges.take(4) == Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
  }

  test("merge application is left-to-right non-overlapping, rank order") {
    assert(Bpe.mergePass(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergePass(Vector("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
    // the Catalyst replace-chain encoder agrees with the trainer's mergePass
    val merges = Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w")
    val got = Seq("lowest", "newest", "low", "aaa")
      .toDF("w").select(Bpe.encodeWord($"w", merges).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("low", "est"),
      Seq("n", "e", "w", "est"),
      Seq("low"),
      Seq("a", "a", "a")))
  }

  test("trainFromCorpus: distributed word counts feed the same merge loop") {
    val docs = Seq.fill(5)("low low lower").map(Tuple1(_)).toDF("text")
      .union(Seq.fill(6)("newest widest newest").map(Tuple1(_)).toDF("text"))
    val distributed = Bpe.trainFromCorpus(docs.repartition(7), "text", 100, 4)
    val local = Bpe.train(
      Map("low" -> 10L, "lower" -> 5L, "newest" -> 12L, "widest" -> 6L), 4)
    assert(distributed == local)
  }

  test("tokensExpr: whole-document stream, sep-forgery stripped, empties dropped") {
    val toks = Seq(Tuple1("lowest  NEWest "))
      .toDF("text")
      .select(Bpe.tokensExpr($"text",
        Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w")).as("t"))
      .as[Seq[String]].collect().head
    assert(toks == Seq("low", "est", "n", "e", "w", "est"))
  }

  test("default merges are a real trained table and round-trip the sample") {
    assert(Bpe.defaultMerges.size >= 30)
    // high-frequency sample words compress to few tokens
    val n = Seq(Tuple1("the table value query"))
      .toDF("text").select(size(Bpe.tokensExpr($"text")).as("n"))
      .as[Int].collect().head
    assert(n <= 8, s"trained merges should compress common words, got $n tokens")
  }
}
