package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

case class Ev(ts: Timestamp, event_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(t: String, id: Long, typ: String = "click", v: Double = 1.0) =
    Ev(Timestamp.valueOf(t), id, typ, v)

  test("streaming dedup drops resubmitted events within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val deduped = StreamingIngest.dedupStream(mem.toDF(), "ts", "event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(ev("2024-01-01 10:00:00", 1), ev("2024-01-01 10:00:01", 2))
      q.processAllAvailable()
      mem.addData(ev("2024-01-01 10:00:00", 1), // exact resubmission → dropped
        ev("2024-01-01 10:05:00", 3))
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      assert(n == 3, s"expected 3 unique events, got $n")
    } finally q.stop()
  }

  test("windowed aggregation emits per-window counts after watermark passes") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamingIngest.windowedCounts(mem.toDF(), "ts", "event_type",
      window_ = "1 hour", lateness = "1 minute")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData(ev("2024-01-01 10:10:00", 1), ev("2024-01-01 10:20:00", 2),
        ev("2024-01-01 11:05:00", 3))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window so it finalizes
      mem.addData(ev("2024-01-01 13:00:00", 4))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(col("window.start").cast("string"), col("n")).collect()
      val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m.get("2024-01-01 10:00:00").contains(2L), s"got $m")
    } finally q.stop()
  }

  test("KQL windowed summarize over a stream: bin lowers to an event-time window, watermark finalizes buckets in append mode") {
    // the declared language's central idiom (`summarize count() by
    // bin(_ts, 1h)`) against a STREAM, from KQL text: the parser lowers
    // the whole-group bin to window(ts, Δ) and `set streaming_watermark`
    // applies withWatermark — so append mode emits a bucket exactly when
    // the watermark passes its end (event-time state with eviction, the
    // 100 TB posture), which a derived-column groupBy can never do
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val kql = graft.kql.KqlParser.parse(
      """set streaming_watermark = 1m;
        |events
        || where event_type != 'scroll'
        || summarize n = count(), sv = sum(tolong(value))
        |  by b = bin(ts, 1h), event_type""".stripMargin,
      { case "events" => mem.toDF()
        case other => throw new IllegalArgumentException(other) })
    assert(kql.isStreaming, "the KQL plan must stay a streaming plan")
    val q = kql.writeStream.format("memory").queryName("kql_winsum_out")
      .outputMode("append").start()
    try {
      mem.addData(ev("2024-01-01 10:10:00", 1, "click", 3.7),
        ev("2024-01-01 10:20:00", 2, "click", 1.2),
        ev("2024-01-01 10:40:00", 3, "view", 2.0),
        ev("2024-01-01 10:30:00", 9, "scroll", 9.9))
      q.processAllAvailable()
      // nothing finalized yet: the watermark has not passed 11:00
      assert(spark.table("kql_winsum_out").count() == 0)
      // an event far past the bucket advances the watermark → the 10:00
      // bucket finalizes and emits; the 13:00 bucket stays open (append
      // mode emits each bucket exactly once, when it can no longer change)
      mem.addData(ev("2024-01-01 13:00:00", 4, "click", 5.0))
      q.processAllAvailable()
      val got = spark.table("kql_winsum_out")
        .select(col("b").cast("string"), col("event_type"), col("n"), col("sv"))
        .as[(String, String, Long, Long)].collect().toSet
      assert(got == Set(
        ("2024-01-01 10:00:00", "click", 2L, 4L), // tolong(3.7)+tolong(1.2)
        ("2024-01-01 10:00:00", "view", 1L, 2L)), got.toString)
    } finally q.stop()
    // the same KQL text over the same rows as a BATCH table equals the
    // stream's complete result (bin ≡ window.start value-for-value)
    val batch = Seq(ev("2024-01-01 10:10:00", 1, "click", 3.7),
      ev("2024-01-01 10:20:00", 2, "click", 1.2),
      ev("2024-01-01 10:40:00", 3, "view", 2.0),
      ev("2024-01-01 10:30:00", 9, "scroll", 9.9),
      ev("2024-01-01 13:00:00", 4, "click", 5.0)).toDF()
    val b = graft.kql.KqlParser.parse(
      """events
        || where event_type != 'scroll'
        || summarize n = count(), sv = sum(tolong(value))
        |  by b = bin(ts, 1h), event_type""".stripMargin,
      { case "events" => batch })
      .select(col("b").cast("string"), col("event_type"), col("n"), col("sv"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(b.contains(("2024-01-01 10:00:00", "click", 2L, 4L)) &&
      b.contains(("2024-01-01 13:00:00", "click", 1L, 5L)), b.toString)
    // the watermark can only attach to a PLAIN event-time column — a
    // derived bin source refuses loudly at parse time
    val e = intercept[IllegalArgumentException] {
      graft.kql.KqlParser.parse(
        """set streaming_watermark = 1m;
          |events
          || summarize n = count() by b = bin(coalesce(ts, ts), 1h)""".stripMargin,
        { case "events" => mem.toDF()
          case other => throw new IllegalArgumentException(other) })
    }
    assert(e.getMessage.contains("plain event-time column"), e.getMessage)
    // an explicit watermark with NO bin time axis is refused, not
    // silently dropped into unbounded complete-mode state
    val e2 = intercept[IllegalArgumentException] {
      graft.kql.KqlParser.parse(
        """set streaming_watermark = 1m;
          |events
          || summarize n = count() by event_type""".stripMargin,
        { case "events" => mem.toDF()
          case other => throw new IllegalArgumentException(other) })
    }
    assert(e2.getMessage.contains("time axis"), e2.getMessage)
    // bare `summarize by ...` (distinct over keys) routes through the SAME
    // lowering: binned keys become event-time windows, the watermark
    // applies, append mode emits each finalized key exactly once
    val mem2 = MemoryStream[Ev]
    val kqlD = graft.kql.KqlParser.parse(
      """set streaming_watermark = 1m;
        |events
        || summarize by b = bin(ts, 1h), event_type""".stripMargin,
      { case "events" => mem2.toDF()
        case other => throw new IllegalArgumentException(other) })
    assert(kqlD.isStreaming)
    val qD = kqlD.writeStream.format("memory").queryName("kql_winsum_dist")
      .outputMode("append").start()
    try {
      mem2.addData(ev("2024-01-01 10:10:00", 1, "click", 1.0),
        ev("2024-01-01 10:20:00", 2, "click", 1.0),
        ev("2024-01-01 10:40:00", 3, "view", 2.0))
      qD.processAllAvailable()
      mem2.addData(ev("2024-01-01 13:00:00", 4, "click", 5.0))
      qD.processAllAvailable()
      val gotD = spark.table("kql_winsum_dist")
        .select(col("b").cast("string"), col("event_type"))
        .as[(String, String)].collect().toSet
      assert(gotD == Set(("2024-01-01 10:00:00", "click"),
        ("2024-01-01 10:00:00", "view")), gotD.toString)
    } finally qD.stop()
    // dcount over a stream maps to approx_count_distinct — Kusto's OWN
    // semantics (its dcount is HLL-based; the exact countDistinct mapping
    // is the batch oracle-friendly deviation) and the only form Spark can
    // stream at all. HLL++ at rsd 0.01 is exact at this cardinality.
    val mem3 = MemoryStream[Ev]
    val kqlDc = graft.kql.KqlParser.parse(
      """set streaming_watermark = 1m;
        |events
        || summarize u = dcount(event_id) by b = bin(ts, 1h)""".stripMargin,
      { case "events" => mem3.toDF()
        case other => throw new IllegalArgumentException(other) })
    val qDc = kqlDc.writeStream.format("memory").queryName("kql_winsum_dc")
      .outputMode("append").start()
    try {
      mem3.addData(ev("2024-01-01 10:10:00", 1), ev("2024-01-01 10:20:00", 2),
        ev("2024-01-01 10:30:00", 3), ev("2024-01-01 10:40:00", 3))
      qDc.processAllAvailable()
      mem3.addData(ev("2024-01-01 13:00:00", 9))
      qDc.processAllAvailable()
      val gotDc = spark.table("kql_winsum_dc")
        .select(col("b").cast("string"), col("u"))
        .as[(String, Long)].collect().toSet
      assert(gotDc == Set(("2024-01-01 10:00:00", 3L)), gotDc.toString)
    } finally qDc.stop()
    // the shuffle-hint partition leg routes through the SAME lowering —
    // not a backdoor where the watermark silently drops
    val mem4 = MemoryStream[Ev]
    val kqlP = graft.kql.KqlParser.parse(
      """set streaming_watermark = 1m;
        |events
        || partition hint.strategy=shuffle by event_type (
        |    summarize n = count() by b = bin(ts, 1h) )""".stripMargin,
      { case "events" => mem4.toDF()
        case other => throw new IllegalArgumentException(other) })
    assert(kqlP.isStreaming)
    val qP = kqlP.writeStream.format("memory").queryName("kql_winsum_part")
      .outputMode("append").start()
    try {
      mem4.addData(ev("2024-01-01 10:10:00", 1, "click", 1.0),
        ev("2024-01-01 10:20:00", 2, "view", 1.0))
      qP.processAllAvailable()
      mem4.addData(ev("2024-01-01 13:00:00", 4, "click", 1.0))
      qP.processAllAvailable()
      // Kusto drops the partition key unless the by-list names it: the
      // finalized bucket emits (b, n) per key — two keys, same bucket
      val gotP = spark.table("kql_winsum_part")
        .select(col("b").cast("string"), col("n"))
        .as[(String, Long)].collect().toSeq.sorted
      assert(gotP == Seq(("2024-01-01 10:00:00", 1L),
        ("2024-01-01 10:00:00", 1L)), gotP.toString)
    } finally qP.stop()
    // count_distinct is Kusto's EXACT variant — on a stream it refuses
    // toward dcount instead of silently approximating
    val e3 = intercept[IllegalArgumentException] {
      graft.kql.KqlParser.parse(
        """events
          || summarize u = count_distinct(event_id) by b = bin(ts, 1h)""".stripMargin,
        { case "events" => mem3.toDF()
          case other => throw new IllegalArgumentException(other) })
    }
    assert(e3.getMessage.contains("cannot stream"), e3.getMessage)
    // a by-less summarize right after a binned PROJECT (the project runs
    // in the SAME parser, so its bin capture is the live stale state) must
    // not consume that capture: pre-guard this crashed with an index error
    // shifting the phantom bin past the lone partition-key group; now the
    // watermark refuses on the genuinely missing time axis
    val eStale = intercept[IllegalArgumentException] {
      graft.kql.KqlParser.parse(
        """set streaming_watermark = 1m;
          |events
          || partition hint.strategy=shuffle by event_type (
          |    project b = bin(ts, 1h), value | summarize n = count() )""".stripMargin,
        { case "events" => mem4.toDF()
          case other => throw new IllegalArgumentException(other) })
    }
    assert(eStale.getMessage.contains("time axis"), eStale.getMessage)
    // same stale-capture shape on the MAIN path (no partition wrapper)
    val eStale2 = intercept[IllegalArgumentException] {
      graft.kql.KqlParser.parse(
        """set streaming_watermark = 1m;
          |events
          || project b = bin(ts, 1h), value
          || summarize n = count()""".stripMargin,
        { case "events" => mem4.toDF()
          case other => throw new IllegalArgumentException(other) })
    }
    assert(eStale2.getMessage.contains("time axis"), eStale2.getMessage)
    // hint.* inside a leg's summarize parses (accepted-and-ignored, the
    // main-path convention) — batch form, values per partition key
    val hinted = graft.kql.KqlParser.parse(
      """events
        || partition hint.strategy=shuffle by event_type (
        |    summarize hint.shufflekey=value n = count() by b = bin(ts, 1h) )""".stripMargin,
      { case "events" => Seq(ev("2024-01-01 10:10:00", 1, "click", 1.0),
          ev("2024-01-01 10:20:00", 2, "view", 1.0)).toDF()
        case other => throw new IllegalArgumentException(other) })
      .select(col("b").cast("string"), col("n"))
      .as[(String, Long)].collect().toSeq.sorted
    assert(hinted == Seq(("2024-01-01 10:00:00", 1L),
      ("2024-01-01 10:00:00", 1L)), hinted.toString)
    // bare `summarize by ...` inside a shuffle leg: the distinct form
    // parses (it previously failed at `by`) and routes through the same
    // lowering — finalized distinct keys per partition key
    val mem5 = MemoryStream[Ev]
    val kqlB = graft.kql.KqlParser.parse(
      """set streaming_watermark = 1m;
        |events
        || partition hint.strategy=shuffle by event_type (
        |    summarize by b = bin(ts, 1h) )""".stripMargin,
      { case "events" => mem5.toDF()
        case other => throw new IllegalArgumentException(other) })
    assert(kqlB.isStreaming)
    val qB = kqlB.writeStream.format("memory").queryName("kql_winsum_bareby")
      .outputMode("append").start()
    try {
      mem5.addData(ev("2024-01-01 10:10:00", 1, "click", 1.0),
        ev("2024-01-01 10:20:00", 2, "view", 1.0))
      qB.processAllAvailable()
      mem5.addData(ev("2024-01-01 13:00:00", 4, "click", 1.0))
      qB.processAllAvailable()
      val gotB = spark.table("kql_winsum_bareby")
        .select(col("b").cast("string")).as[String].collect().toSeq.sorted
      // key dropped (not named in the by-list): one finalized bucket per
      // (event_type, b) pair — click and view both in the 10:00 bucket
      assert(gotB == Seq("2024-01-01 10:00:00", "2024-01-01 10:00:00"),
        gotB.toString)
    } finally qB.stop()
    // make-series cannot stream (grid fill joins after the aggregation):
    // refused at parse time naming the windowed-summarize alternative
    val e4 = intercept[IllegalArgumentException] {
      graft.kql.KqlParser.parse(
        "events | make-series n = count() default = 0 on ts step 1h",
        { case "events" => mem3.toDF()
          case other => throw new IllegalArgumentException(other) })
    }
    assert(e4.getMessage.contains("make-series over a stream"), e4.getMessage)
  }

  test("flatMapGroupsWithState sessionizer carries open sessions across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val withUid = mem.toDF().withColumn("user_id", col("event_id") % 2)
    val sess = StreamingIngest.sessionizeWithState(withUid, "user_id", "ts",
      gapSeconds = 600)
    val q = sess.toDF().writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append").start()
    try {
      // batch 1: user 0 starts a session (2 events, 5 min apart)
      mem.addData(ev("2024-01-01 10:00:00", 2), ev("2024-01-01 10:05:00", 4))
      q.processAllAvailable()
      assert(spark.table("fmgws_out").count() == 0) // still open — nothing emitted
      // batch 2: a later event far past the gap CLOSES the batch-1 session —
      // state carried across micro-batches, session spans both batch-1 events
      mem.addData(ev("2024-01-01 12:00:00", 6))
      q.processAllAvailable()
      val rows = spark.table("fmgws_out")
        .select("user_id", "start_us", "end_us", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows.size == 1, rows.toString)
      val r = rows.head
      assert(r._1 == 0L && r._4 == 2L)
      assert(r._3 - r._2 == 300L * 1000000L) // 10:00 → 10:05
    } finally q.stop()
  }

  test("session windows split on inactivity gap") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamingIngest.sessionCounts(mem.toDF(), "ts", "event_type",
      gap = "10 minutes", lateness = "1 minute")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(ev("2024-01-01 10:00:00", 1), ev("2024-01-01 10:05:00", 2),
        ev("2024-01-01 12:00:00", 3)) // second session, far later
      q.processAllAvailable()
      mem.addData(ev("2024-01-01 15:00:00", 4)) // push watermark
      q.processAllAvailable()
      val counts = spark.table("sess_out").select("n").as[Long].collect().sorted.toSeq
      assert(counts.contains(2L), s"got $counts") // first session has 2 events
    } finally q.stop()
  }
}
