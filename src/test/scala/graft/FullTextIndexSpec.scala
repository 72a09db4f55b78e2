package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.FullTextIndex

class FullTextIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox", "en"),
    (2L, "Quick-thinking FOX jumps; the lazy dog naps", "en"),
    (3L, "nothing to see here", "en"),
    (4L, "dog eat dog world", "en"),
    (5L, "fox and dog together", "fr")
  ).toDF("doc_id", "text", "lang")

  private lazy val idxPath = {
    val p = Files.createTempDirectory("graft_ftx_spec").toString
    FullTextIndex.build(docs, "doc_id", Seq("text"), p)
    p
  }

  test("indexed OR search matches the linear word-boundary scan") {
    val got = FullTextIndex.search(spark, idxPath, docs, "doc_id", Seq("fox"))
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 5L))
    val multi = FullTextIndex.search(spark, idxPath, docs, "doc_id", Seq("fox", "dog"))
      .select("doc_id").as[Long].collect().sorted
    assert(multi.toSeq == Seq(1L, 2L, 4L, 5L))
  }

  test("matchAll requires every term; case-insensitive; absent term empty") {
    val both = FullTextIndex.search(spark, idxPath, docs, "doc_id",
      Seq("FOX", "dog"), matchAll = true).select("doc_id").as[Long].collect().sorted
    assert(both.toSeq == Seq(2L, 5L))
    assert(FullTextIndex.search(spark, idxPath, docs, "doc_id", Seq("unicorn")).isEmpty)
    // matchAll with a duplicated term must not demand count 2
    val dup = FullTextIndex.search(spark, idxPath, docs, "doc_id",
      Seq("dog", "DOG"), matchAll = true).select("doc_id").as[Long].collect().sorted
    assert(dup.toSeq == Seq(2L, 4L, 5L))
  }

  test("punctuated / multi-word probes tokenize through the index alphabet") {
    // "Quick-Thinking" → terms {quick, thinking}: both must hold (doc 2 only);
    // a raw probe would match nothing (postings are alphanumeric runs)
    val hyphen = FullTextIndex.search(spark, idxPath, docs, "doc_id",
      Seq("Quick-Thinking")).select("doc_id").as[Long].collect().sorted
    assert(hyphen.toSeq == Seq(2L))
    // OR mode mixes a single-term probe with a multi-term probe
    val mixed = FullTextIndex.search(spark, idxPath, docs, "doc_id",
      Seq("lazy dog", "fox")).select("doc_id").as[Long].collect().sorted
    assert(mixed.toSeq == Seq(1L, 2L, 5L))
    // matchAll over a punctuated probe = all of its terms
    val all = FullTextIndex.search(spark, idxPath, docs, "doc_id",
      Seq("fox; dog"), matchAll = true).select("doc_id").as[Long].collect().sorted
    assert(all.toSeq == Seq(2L, 5L))
  }

  test("term probe is pushed into the posting-table scan; no corpus regex") {
    val plan = FullTextIndex.search(spark, idxPath, docs, "doc_id", Seq("fox"))
      .queryExecution.executedPlan.toString
    val lower = plan.toLowerCase
    assert(plan.contains("PushedFilters") &&
        (lower.contains("equalto(term") || lower.contains("in(term")),
      s"expected term pushdown into the index scan:\n$plan")
    assert(!plan.toLowerCase.contains("rlike"), "probe must not regex the corpus")
  }

  test("per-doc terms are distinct in the posting table (one posting per (term,doc))") {
    val idx = spark.read.parquet(idxPath)
    assert(idx.count() == idx.distinct().count())
    // terms tokenize on non-alphanumeric runs and lowercase
    val t2 = idx.filter($"doc_id" === 2L).select("term").as[String].collect().toSet
    assert(t2 == Set("quick", "thinking", "fox", "jumps", "the", "lazy", "dog", "naps"))
  }
}
