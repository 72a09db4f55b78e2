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
