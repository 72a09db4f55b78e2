package graft

import org.apache.spark.sql.functions._
import graft.kql.Scan

class ScanSpec extends SparkSpec {
  import spark.implicits._

  // user 1: V C P (complete) then V V C (restart mid-way, incomplete)
  // user 2: C P (never starts: no V first) then V P C (stalls at V, P doesn't advance... )
  private lazy val events = Seq(
    (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
    (1L, 4, "view"), (1L, 5, "view"), (1L, 6, "click"),
    (2L, 1, "click"), (2L, 2, "purchase"), (2L, 3, "view"),
    (2L, 4, "purchase"), (2L, 5, "click"), (2L, 6, "purchase")
  ).toDF("user", "t", "etype")

  private val steps = Seq(
    "s_view" -> (col("etype") === "view"),
    "s_click" -> (col("etype") === "click"),
    "s_buy" -> (col("etype") === "purchase"))

  test("scan walks the funnel: advance, restart-at-step-1, reset-on-complete") {
    val got = Scan.scanSequence(events, Seq("user"), Seq(col("t")), steps)
      .select("user", "t", "match_step", "match_seq")
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 1, 1, 1L), (1L, 2, 2, 1L), (1L, 3, 3, 1L), // complete match 1
      (1L, 4, 1, 2L), // new sequence
      (1L, 5, 1, 3L), // view restarts (does not advance to click)
      (1L, 6, 2, 3L), // advances; never completes
      (2L, 3, 1, 1L), // user 2 starts only at its first view
      (2L, 5, 2, 1L), // purchase at t=4 neither advances (needs click) nor restarts
      (2L, 6, 3, 1L) // completes
    ))
  }

  test("completedOnly keeps only sequences that reached the last step") {
    val got = Scan.scanSequence(events, Seq("user"), Seq(col("t")), steps,
        completedOnly = true)
      .select("user", "match_seq").distinct()
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 1L)))
  }

  test("result is invariant to input partitioning (state never leaks across keys)") {
    val shuffled = events.repartition(7, col("t")) // scatter users across partitions
    val a = Scan.scanSequence(events, Seq("user"), Seq(col("t")), steps)
      .select("user", "t", "match_step", "match_seq")
      .as[(Long, Int, Int, Long)].collect().sorted.toSeq
    val b = Scan.scanSequence(shuffled, Seq("user"), Seq(col("t")), steps)
      .select("user", "t", "match_step", "match_seq")
      .as[(Long, Int, Int, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("scanSerialized: one global machine, match ids numbered across partitions") {
    // serialized order = t asc over ALL rows (users interleaved): the global
    // machine crosses user boundaries, unlike scanSequence
    val df = Seq(
      (1, "view"), (2, "click"), (3, "purchase"), // match 1 spans 'users'
      (4, "click"), // ignored (idle, not step 1)
      (5, "view"), (6, "view"), (7, "click"), (8, "purchase") // restart then match 3
    ).toDF("t", "etype")
    val got = graft.kql.Scan.scanSerialized(df.repartition(4), Seq(col("t")), steps)
      .select("t", "match_step", "match_id")
      .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1, 1, 1L), (2, 2, 1L), (3, 3, 1L),
      (5, 1, 2L), (6, 1, 3L), (7, 2, 3L), (8, 3, 3L)))
  }

  test("KQL text scan operator parses and matches the API result") {
    val got = graft.kql.KqlParser.parse(
      """scan_events
        || sort by user asc, t asc
        || scan with_match_id=m with (
        |    step s1: etype == 'view';
        |    step s2: etype == 'click';
        |    step s3: etype == 'purchase';
        |  )
        || sort by user asc, t asc""".stripMargin, _ => events)
      .select("user", "t", "m").as[(Long, Int, Long)].collect().toSeq
    // global machine over (user, t) order: user 1 rows (t1..t6) then user 2's.
    // V C P | V V C | then user2: C(advances nothing: idle after seq3 at step2...
    // user1 t6 click leaves machine at step 2; user2 t1 click does NOT advance
    // (step 3 needs purchase); t2 purchase COMPLETES seq 3 across the boundary;
    // then t3 view starts seq4, t4 purchase idles it... wait: seq4 at step1,
    // t4 purchase neither advances (needs click) nor restarts; t5 click
    // advances seq4 to step2; t6 purchase completes seq4.
    assert(got == Seq(
      (1L, 1, 1L), (1L, 2, 1L), (1L, 3, 1L),
      (1L, 4, 2L), (1L, 5, 3L), (1L, 6, 3L),
      (2L, 2, 3L), (2L, 3, 4L), (2L, 5, 4L), (2L, 6, 4L)))
  }

  test("randomized: distributed scans equal the in-memory reference machine") {
    // reference fold: same advance > restart > pass semantics, sequential
    def reference(rows: Seq[(Long, Int, String)], k: Int)
    : Seq[(Long, Int, Int, Long)] = {
      val stepOf = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
      rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
        var st = 0
        var seq = 0L
        rs.sortBy(_._2).flatMap { case (_, t, e) =>
          val m = stepOf.get(e)
          val adv = m.contains(st) && st < k
          if (adv || m.contains(0)) {
            val emitted = if (adv && st > 0) st + 1 else { seq += 1; 1 }
            st = if (emitted == k) 0 else emitted
            Some((u, t, emitted, seq))
          } else { None }
        }
      }
    }
    val rnd = new scala.util.Random(1234)
    val kinds = Vector("view", "click", "purchase", "error", "signup")
    (1 to 3).foreach { trial =>
      val rows = (1 to 400).map { i =>
        (rnd.nextInt(7).toLong, i, kinds(rnd.nextInt(kinds.size)))
      }
      val df = rows.toDF("user", "t", "etype").repartition(5)
      val got = Scan.scanSequence(df, Seq("user"), Seq(col("t")), steps)
        .select("user", "t", "match_step", "match_seq")
        .as[(Long, Int, Int, Long)].collect().sorted.toSeq
      val want = reference(rows, 3).sorted
      assert(got == want, s"trial $trial mismatch")
    }
  }

  test("single-step scan marks every matching row as its own completed match") {
    val got = Scan.scanSequence(events, Seq("user"), Seq(col("t")),
        Seq("v" -> (col("etype") === "view")), completedOnly = true)
      .select("user", "t", "match_step", "match_seq")
      .as[(Long, Int, Int, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 1, 1, 1L), (1L, 4, 1, 2L), (1L, 5, 1, 3L), (2L, 3, 1, 1L)))
  }
}
