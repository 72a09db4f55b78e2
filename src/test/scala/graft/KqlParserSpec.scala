package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kql.KqlParser

class KqlParserSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t: DataFrame = Seq(
    (1L, "alice", "click", 10.0, "2024-01-01 10:00:00"),
    (2L, "bob", "view", 25.5, "2024-01-01 11:30:00"),
    (3L, "alice", "click", 50.0, "2024-01-01 13:00:00"),
    (4L, "carol", "purchase", 99.0, "2024-01-02 09:00:00"),
    (5L, "bob", "click", 7.25, "2024-01-02 10:15:00")
  ).toDF("id", "user", "etype", "v", "ts_s")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  private def run(kql: String): DataFrame = KqlParser.parse(kql, _ => t)

  test("where with comparison, boolean ops, in, between") {
    assert(run("t | where v > 10 and etype in ('click', 'view')").count() == 2)
    assert(run("t | where v between (7 .. 26) or user == 'carol'").count() == 4)
    assert(run("t | where not (etype == 'click')").count() == 2)
    assert(run("t | where etype != 'click' and v >= 25.5").count() == 2)
  }

  test("string predicates: contains / startswith / endswith / has / matches regex") {
    assert(run("t | where user contains 'li'").count() == 2)
    assert(run("t | where user startswith 'b'").count() == 2)
    assert(run("t | where user endswith 'ol'").count() == 1)
    assert(run("t | where etype has 'click'").count() == 3)
    assert(run("t | where user matches regex '^[ab]'").count() == 4)
  }

  test("project, extend, project-rename, project-away round-trip") {
    val df = run("t | extend vv = v * 2 + 1 | project id, vv | sort by id asc")
    assert(df.columns.toSeq == Seq("id", "vv"))
    assert(df.as[(Long, Double)].collect().head == (1L, 21.0))
    assert(run("t | project-rename uid = id").columns.contains("uid"))
    assert(!run("t | project-away v, ts").columns.contains("v"))
  }

  test("summarize with aliases and by keys") {
    val df = run(
      "t | summarize n = count(), total = sum(v), du = dcount(user) by etype | sort by etype asc")
    val rows = df.as[(String, Long, Double, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("click", "purchase", "view"))
    assert(rows.head == ("click", 3L, 67.25, 2L)) // alice, alice, bob
  }

  test("summarize countif/avgif/arg_max") {
    val df = run(
      "t | summarize big = countif(v > 20), am = arg_max(v, user)")
    val (big, am) = df.as[(Long, String)].collect().head
    assert(big == 3L && am == "carol")
  }

  test("top / take / distinct / count operators") {
    assert(run("t | top 2 by v desc | project user").as[String].collect().toSeq
      == Seq("carol", "alice"))
    assert(run("t | take 3").count() == 3)
    assert(run("t | distinct etype").count() == 3)
    assert(run("t | count").as[Long].collect().head == 5L)
  }

  test("join (default innerunique dedupes left) and explicit kinds") {
    val kql = "t | project user, v | join kind=inner (t | summarize n = count() by user) on user"
    assert(run(kql).count() == 5)
    val iu = run("t | project user | join (t | summarize n = count() by user) on user")
    assert(iu.count() == 3) // innerunique: left deduped on key
    assert(run("t | join kind=leftanti (t | where v > 20) on id").count() == 2) // ids 1, 5
  }

  test("bin with timespan literal buckets timestamps") {
    val df = run("t | extend b = bin(ts, 1d) | summarize n = count() by b | sort by b asc")
    assert(df.as[(java.sql.Timestamp, Long)].collect().map(_._2).toSeq == Seq(3L, 2L))
  }

  test("scalar functions: strlen/toupper/substring/iff/round") {
    val df = run(
      "t | extend u = toupper(substring(user, 0, 2)), band = iff(v >= 25, 'hi', 'lo'), r = round(v, 1) | project id, u, band, r | sort by id asc")
    val rows = df.as[(Long, String, String, Double)].collect()
    assert(rows.head == (1L, "AL", "lo", 10.0))
    assert(rows(1) == (2L, "BO", "hi", 25.5))
  }

  test("union and mv-expand") {
    assert(run("t | union (t | where v > 20)").count() == 8)
    val arr = t.withColumn("tags", array(lit("a"), lit("b")))
    val exploded = KqlParser.parse("t | mv-expand tags", _ => arr)
    assert(exploded.count() == 10)
  }

  test("database('db').Table resolves via the db::table convention") {
    val seen = scala.collection.mutable.Buffer[String]()
    val resolver: String => org.apache.spark.sql.DataFrame =
      n => { seen += n; t }
    assert(KqlParser.parse("database('crm').t | where v > 20", resolver).count() == 3)
    assert(seen.toSeq == Seq("crm::t"))
    // cluster qualifier is accepted and ignored; database still required
    seen.clear()
    KqlParser.parse("cluster('c').database('crm').t | count", resolver).collect()
    assert(seen.toSeq == Seq("crm::t"))
    assertThrows[IllegalArgumentException](
      KqlParser.parse("cluster('c').t | count", resolver))
    // joins take qualified tables on the right side (subquery source position)
    seen.clear()
    KqlParser.parse(
      "t | join kind=inner (database('sales').t | project id, v2 = v) on id",
      resolver).collect()
    assert(seen.toSeq == Seq("t", "sales::t"))
  }

  test("serialize enables row functions over the sorted order") {
    val df = run(
      "t | sort by id asc | serialize | extend rn = row_number(), p = prev(v), c = row_cumsum(v) | project id, rn, p, c")
    val rows = df.orderBy("id").as[(Long, Int, Option[Double], Double)].collect()
    assert(rows.head == (1L, 1, None, 10.0))
    assert(rows(1) == (2L, 2, Some(10.0), 35.5))
  }

  test("row functions without serialize raise a parse error") {
    assertThrows[IllegalArgumentException](run("t | extend rn = row_number()"))
  }

  test("let bindings name subqueries and compose") {
    val kql =
      """let hot = t | where v > 20;
        |let who = t | distinct user;
        |hot | join kind=inner (who) on user | count""".stripMargin
    assert(run(kql).as[Long].collect().head == 3L)
  }

  test("print evaluates single-row expressions") {
    val df = run("print x = 1 + 2, s = toupper('ab')")
    assert(df.as[(Long, String)].collect().head == (3L, "AB"))
  }

  test("datatable builds an inline literal table") {
    val df = run(
      """datatable(name:string, qty:long, price:real) [
        |  'apple', 3, 1.5,
        |  'pear', -2, 0.75
        |] | where qty > 0 | project name, price""".stripMargin)
    assert(df.as[(String, Double)].collect().toSeq == Seq(("apple", 1.5)))
  }

  test("parse operator extracts anchored captures with types") {
    val logs = Seq("GET /api/users took 42ms", "POST /api/send took 7ms")
      .toDF("line")
    val df = KqlParser.parse(
      "t | parse line with method ' /api/' endpoint ' took ' ms:long 'ms'",
      _ => logs)
    val rows = df.select("method", "endpoint", "ms").as[(String, String, Long)]
      .collect().toSeq.sortBy(_._3)
    assert(rows == Seq(("POST", "send", 7L), ("GET", "users", 42L)))
  }

  test("mv-apply runs a sub-pipeline over exploded elements") {
    val arr = t.withColumn("tags", array(col("etype"), lit("zz"), lit("aa")))
    val df = KqlParser.parse(
      "t | mv-apply tag = tags on (where tag != 'zz' | extend tag = toupper(tag)) | project id, tag",
      _ => arr)
    assert(df.count() == 10) // 2 surviving tags per row
    assert(df.filter(col("tag") === "ZZ").count() == 0)
    assert(df.filter(col("tag") === "AA").count() == 5)
  }

  test("evaluate bag_unpack expands a JSON bag to columns") {
    val bag = t.select(col("id"), to_json(struct(col("user"), col("v"))).as("props"))
    val df = KqlParser.parse("t | evaluate bag_unpack(props) | project id, user, v",
      _ => bag)
    assert(df.columns.toSeq == Seq("id", "user", "v"))
    assert(df.count() == 5)
  }

  test("unsupported operator raises a parse error") {
    assertThrows[IllegalArgumentException](run("t | no_such_operator user"))
    assertThrows[IllegalArgumentException](run("t | where v ?? 3"))
  }

  test("format_bytes picks the largest matching unit; format_timespan signs") {
    val df = run("""t | where id == 1 | project
      b0 = format_bytes(512), b1 = format_bytes(1536000),
      b2 = format_bytes(2684354560, 2),
      t0 = format_timespan(3723), t1 = format_timespan(90061),
      t2 = format_timespan(totimespan('01:00:30') * -1)""")
    val r = df.as[(String, String, String, String, String, String)].collect().head
    assert(r == (("512 Bytes", "1 MB", "2.50 GB", "01:02:03", "1.01:01:01", "-01:00:30")))
  }

  test("reduce by groups values into patterns") {
    val df = run("t | reduce by user")
    assert(df.columns.toSeq.take(2) == Seq("Pattern", "Count"))
    assert(df.count() > 0)
  }

  test("sort state is scoped per query: a let/subquery sort cannot enable serialize outside") {
    // the outer pipeline has no sort of its own, so serialize must throw even
    // though a let binding (parsed first) sorted
    assertThrows[IllegalArgumentException](run(
      "let b = t | sort by id asc; t | serialize | extend rn = row_number()"))
    // ...and a subquery's sort must not leak either
    assertThrows[IllegalArgumentException](run(
      "t | union (t | sort by id asc) | serialize | extend rn = row_number()"))
  }

  test("row functions work in where and project after serialize") {
    assert(run("t | sort by id asc | serialize | where row_number() > 2").count() == 3)
    val df = run(
      "t | sort by id asc | serialize | project id, rn = row_number(), pv = prev(v)")
    assert(df.columns.toSeq == Seq("id", "rn", "pv"))
    assert(df.orderBy("id").select("rn").as[Int].collect().toSeq == (1 to 5))
  }

  test("row functions in unsupported operators are rejected") {
    // fails either as the explicit buffer check or as an unresolved placeholder
    // column — never silently mis-evaluates
    assertThrows[Exception](run(
      "t | sort by id asc | serialize | summarize m = max(row_number())"))
  }

  test("case-insensitive string operators with _cs variants") {
    val up = t.withColumn("user", upper(col("user")))
    def runUp(kql: String) = KqlParser.parse(kql, _ => up)
    assert(runUp("t | where user contains 'li'").count() == 2)
    assert(runUp("t | where user contains_cs 'li'").count() == 0)
    assert(runUp("t | where user startswith 'b'").count() == 2)
    assert(runUp("t | where user startswith_cs 'b'").count() == 0)
    assert(runUp("t | where user endswith 'ol'").count() == 1)
    assert(runUp("t | where user endswith_cs 'OL'").count() == 1)
  }

  test("has_any / has_all term matching") {
    assert(run("t | where etype has_any ('click', 'view')").count() == 4)
    assert(run("t | where etype has_all ('click', 'view')").count() == 0)
  }

  test("range source generates an inclusive stepped sequence") {
    val df = run("range x from 1 to 10 step 3 | summarize n = count(), mx = max(x)")
    assert(df.as[(Long, Long)].collect().head == (4L, 10L))
  }

  test("top-nested keeps the top keys per level") {
    val df = run(
      "t | top-nested 1 of user by s = count(), top-nested 1 of etype by m = max(v)")
    // top user by row count: alice/bob tie at 2 → tie-break asc keeps alice;
    // her top etype by max(v) is click (50.0)
    val r = df.select("user", "s", "etype", "m").as[(String, Long, String, Double)]
      .collect().toSeq
    assert(r == Seq(("alice", 2L, "click", 50.0)))
  }

  test("top-nested composes beyond two levels") {
    val df = run(
      """t | top-nested 2 of user by s = count(),
        |  top-nested 1 of etype by m = max(v),
        |  top-nested 1 of id by mi = min(id)""".stripMargin)
    assert(df.columns.toSeq == Seq("user", "s", "etype", "m", "id", "mi"))
    // users alice+bob (count 2, tie-break asc); per user the top etype by
    // max(v); then the top id ranked by its aggregate DESC (alice's click
    // rows are ids 1 and 3 → min(id)-per-id desc keeps id 3)
    val rows = df.select("user", "etype", "id").as[(String, String, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(rows == Seq(("alice", "click", 3L), ("bob", "view", 2L)))
  }

  test("invoke applies a let-bound tabular function to the piped table") {
    val df = run(
      """let top2 = (src:(v:real)) { src | top 2 by v desc | extend vv = v * 2 };
        |t | invoke top2() | project user, vv | sort by vv desc""".stripMargin)
    assert(df.as[(String, Double)].collect().toSeq ==
      Seq(("carol", 198.0), ("alice", 100.0)))
  }

  test("scalar let bindings substitute constants, compose, and coexist with tabular lets") {
    val df = run(
      """let lo = 10;
        |let hi = lo * 5;
        |let hot = t | where v > lo and v < hi;
        |hot | summarize n = count(), mx = max(v)""".stripMargin)
    // v ∈ {10.0, 25.5, 50.0, 99.0, 7.25}; 10 < v < 50 keeps only 25.5
    assert(df.as[(Long, Double)].collect().head == (1L, 25.5))
  }

  test("scalar let does not shadow a bare tabular alias") {
    // `let alias = t;` must stay a TABULAR binding (bare ident), not a scalar
    val df = run("let alias = t; alias | count")
    assert(df.as[Long].collect().head == 5L)
  }

  test("invoke with scalar arguments binds trailing parameters") {
    val df = run(
      """let f = (src:(v:real), lo:real, m:long) { src | where v > lo | extend vm = v * m };
        |t | invoke f(20.0, 2) | summarize n = count(), s = sum(vm)""".stripMargin)
    assert(df.as[(Long, Double)].collect().head == (3L, 349.0)) // (25.5+50+99)*2
  }

  test("invoke arity mismatch raises a parse error") {
    assertThrows[IllegalArgumentException](run(
      "let f = (src:(v:real), lo:real) { src | where v > lo }; t | invoke f()"))
  }

  test("search filters by term across every string column") {
    assert(run("t | search 'alice'").count() == 2) // matches user column
    assert(run("t | search 'click'").count() == 3) // matches etype column
    assert(run("t | search 'ali'").count() == 0) // term match, not substring
    assert(run("t | search 'ALICE'").count() == 2) // case-insensitive
  }

  test("row_window_session splits at the maxDuration rollover") {
    // 30m-spaced run (never exceeds the 30m idle gap? 30m gaps are NOT > 30m)
    // spanning 4.5h with a 2h maxDuration: windows restart at the first event
    // MORE than 2h past the window start
    val times = (0 to 9).map(i => s"2024-01-01 0${i / 2}:${if (i % 2 == 0) "00" else "30"}:00")
    val src = times.toDF("ts_s").withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val df = KqlParser.parse(
      "t | sort by ts asc | serialize | extend w = row_window_session(ts, 2h, 30m)",
      _ => src)
    val starts = df.orderBy("ts").select("w").as[java.sql.Timestamp]
      .collect().map(_.toString).toSeq
    assert(starts.take(5).forall(_ == "2024-01-01 00:00:00.0"))
    assert(starts.drop(5).forall(_ == "2024-01-01 02:30:00.0"))
  }

  test("union withsource labels rows by source table") {
    val df = run(
      """let lows = t | where v < 10 | project id;
        |t | where v > 50 | project id | union withsource = origin lows
        || summarize n = count() by origin | sort by origin asc""".stripMargin)
    assert(df.as[(String, Long)].collect().toSeq ==
      Seq(("lows", 1L), ("t", 1L)))
  }

  test("facet by folds per-column value frequencies into one table") {
    val df = run("t | facet by etype, user | sort by facet_column asc, value asc")
    assert(df.columns.toSeq == Seq("facet_column", "value", "count_"))
    val rows = df.as[(String, String, Long)].collect().toSeq
    assert(rows.contains(("etype", "click", 3L)))
    assert(rows.contains(("user", "alice", 2L)))
    assert(rows.count(_._1 == "etype") == 3 && rows.count(_._1 == "user") == 3)
  }

  test("partition by runs the sub-pipeline once per key value") {
    val df = run("t | partition by user ( top 1 by v ) | sort by user asc")
    // per-user max of v (Kusto default sort direction for top is desc)
    assert(df.select("user", "v").as[(String, Double)].collect().toSeq ==
      Seq(("alice", 50.0), ("bob", 25.5), ("carol", 99.0)))
  }

  test("partition hint.strategy=shuffle rewrites to one distributed plan") {
    val legacy = run("t | partition by user ( top 1 by v ) | sort by user asc")
    val shuffle = run(
      "t | partition hint.strategy=shuffle by user ( top 1 by v ) | sort by user asc")
    assert(shuffle.collect().toSeq == legacy.collect().toSeq)
    // the rewrite is one plan with the key riding the shuffle — no per-key
    // plan union, no driver key enumeration
    assert(!shuffle.queryExecution.executedPlan.toString.contains("Union"))
  }

  test("shuffle-strategy summarize drops the key unless the by-list names it") {
    val dropped = run(
      "t | partition hint.strategy=shuffle by user ( summarize n = count() by etype )")
    assert(dropped.columns.toSeq == Seq("etype", "n"))
    // per-(user, etype) counts with the key projected away — etype repeats
    // across users: alice 2 clicks, bob 1 click + 1 view, carol 1 purchase
    val rows = dropped.as[(String, Long)].collect().toSeq.sorted
    assert(rows == Seq(("click", 1L), ("click", 2L), ("purchase", 1L), ("view", 1L)))
    val kept = run(
      "t | partition hint.strategy=shuffle by user ( summarize n = count() by user )")
    assert(kept.columns.toSeq == Seq("user", "n"))
  }

  test("shuffle strategy rejects operators that cannot ride the key") {
    assertThrows[IllegalArgumentException](run(
      "t | partition hint.strategy=shuffle by user ( take 2 )"))
  }

  test("partition by rejects over 64 distinct keys") {
    val wide = spark.range(100).selectExpr("id", "cast(id as string) as k")
    val e = intercept[IllegalArgumentException] {
      KqlParser.parse("w | partition by k ( take 1 )", _ => wide).collect()
    }
    assert(e.getMessage.contains("64"))
  }

  test("fork runs each leg over the same input, aligned by name with null-fill") {
    val df = run(
      """t | fork hi=(where v > 20 | summarize n = count() by etype)
        |     (where v < 10 | summarize mv = max(v) by etype)
        || sort by fork_leg asc, etype asc""".stripMargin)
    val rows = df.select("fork_leg", "etype", "n", "mv")
      .as[(String, String, Option[Long], Option[Double])].collect().toSeq
    assert(rows.contains(("hi", "click", Some(1L), None)))
    assert(rows.contains(("hi", "purchase", Some(1L), None)))
    assert(rows.contains(("Result_2", "click", None, Some(7.25))))
  }

  test("top-hitters ranks by exact frequency / sum") {
    val byCount = run("t | top-hitters 1 of etype")
    assert(byCount.columns.toSeq == Seq("etype", "approximate_count_etype"))
    assert(byCount.as[(String, Long)].collect().toSeq == Seq(("click", 3L)))
    val bySum = run("t | top-hitters 1 of user by v")
    assert(bySum.columns.toSeq == Seq("user", "approximate_sum_v"))
    assert(bySum.as[(String, Double)].collect().head == (("carol", 99.0)))
  }

  test("sample-distinct returns N deterministic distinct values") {
    val a = run("t | sample-distinct 2 of user").as[String].collect().toSet
    val b = run("t | sample-distinct 2 of user").as[String].collect().toSet
    assert(a == b && a.size == 2)
    assert(a.subsetOf(Set("alice", "bob", "carol")))
  }

  test("evaluate pivot turns unique values into columns") {
    val df = run("t | project user, etype | evaluate pivot(etype) | sort by user asc")
    assert(df.columns.toSeq == Seq("user", "click", "purchase", "view"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("alice", "bob", "carol"))
    assert(rows(0).getLong(1) == 2L) // alice: 2 clicks
    assert(rows(2).isNullAt(1)) // carol never clicked → null cell
  }

  test("let materialize() binds a persisted table") {
    val df = run(
      """let m = materialize(t | where v > 20 | project id);
        |m | union m | summarize n = count()""".stripMargin)
    assert(df.as[Long].collect().head == 6L) // 3 rows, twice
  }

  test("sort by defaults to Kusto's descending direction") {
    val ids = run("t | sort by v | project id").as[Long].collect().toSeq
    assert(ids == Seq(4L, 3L, 2L, 1L, 5L))
  }

  test("round-6 scalar surface: arrays, bags, bitwise, datetime boundaries") {
    val r = run(
      """t
        || where id == 1
        || extend a = pack_array(3, 1, 2)
        || extend sl = strcat_array(array_slice(a, 1, 2), ';'),
        |    ix = array_index_of(a, 2),
        |    rr = strcat_array(array_rotate_right(a, 1), ';'),
        |    sd = strcat_array(array_sort_desc(a), ';'),
        |    bg = tostring(bag_pack('k', 7)['k']),
        |    bn = binary_not(0),
        |    fin = isfinite(1.0), inf = isinf(pow(10.0, 400)),
        |    sow = startofweek(datetime('2024-01-10')),
        |    eoy = getyear(endofyear(datetime('2024-03-05'))),
        |    ue = url_encode('a b&c'), gt = gettype(id)
        || extend ud = url_decode(ue)
        || project sl, ix, rr, sd, bg, bn, fin, inf, sow, eoy, ue, ud, gt""".stripMargin)
      .collect().head
    assert(r.getString(0) == "1;2")
    assert(r.getLong(1) == 2L)
    assert(r.getString(2) == "2;3;1")
    assert(r.getString(3) == "3;2;1")
    assert(r.getString(4) == "7")
    assert(r.getLong(5) == -1L) // ~0; int literal lexes as long
    assert(r.getBoolean(6) && r.getBoolean(7))
    // 2024-01-10 is a Wednesday → KQL week starts Sunday 2024-01-07
    assert(r.getTimestamp(8).toString.startsWith("2024-01-07"))
    assert(r.getInt(9) == 2024)
    assert(r.getString(10) == "a+b%26c" || r.getString(10) == "a%20b%26c")
    assert(r.getString(11) == "a b&c")
    assert(r.getString(12) == "bigint")
  }

  test("join hint.strategy=broadcast plans a broadcast join") {
    val df = run(
      """t
        || join hint.strategy=broadcast kind=inner (
        |    t | summarize mx = max(v) by user) on user""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join:\n$plan")
  }

  test("mv-expand with_itemindex replaces the column and numbers elements") {
    val rows = run(
      """t
        || where id == 1
        || extend a = pack_array('p', 'q')
        || mv-expand with_itemindex=i a
        || project i, a""".stripMargin)
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((0, "p"), (1, "q")))
  }

  test("mv-expand to typeof() casts elements, nulling non-convertible ones") {
    val rows = run(
      """t
        || where id == 1
        || extend a = pack_array('3', 'oops', '11')
        || mv-expand a to typeof(long)
        || project a""".stripMargin)
      .as[Option[Long]].collect().toSeq
    assert(rows.sorted == Seq(None, Some(3L), Some(11L)).sorted)
    assert(rows.toSet == Set(None, Some(3L), Some(11L)))
    // dynamic (variant) elements: parse_json array expands typed too
    val dyn = run(
      """t
        || where id == 1
        || extend d = parse_json('[1, "x", 3]')
        || mv-expand d to typeof(long)
        || project d""".stripMargin)
      .as[Option[Long]].collect().toSeq
    assert(dyn.toSet == Set(None, Some(1L), Some(3L)))
    // composes with with_itemindex and the aliased form
    val idx = run(
      """t
        || where id == 1
        || extend a = pack_array('5', '6')
        || mv-expand with_itemindex=i v2 = a to typeof(int)
        || project i, v2""".stripMargin)
      .as[(Int, Int)].collect().sortBy(_._1).toSeq
    assert(idx == Seq((0, 5), (1, 6)))
  }

  test("top-nested with others buckets the non-top keys exactly") {
    val rows = run(
      "t | top-nested 1 of user by s = sum(v) with others = 'REST'")
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    // carol: 99; others = alice (10+50) + bob (25.5+7.25) = 92.75
    assert(rows == Seq(("REST", 92.75), ("carol", 99.0)))
    // restriction: others on a non-final level is rejected
    assertThrows[IllegalArgumentException](run(
      """t | top-nested 1 of user by sum(v) with others = 'X',
        |  top-nested 1 of etype by sum(v)""".stripMargin))
  }

  test("theta-form join: differently-named keys, collision rename, semi kinds") {
    val dim = Seq(("alice", 1), ("bob", 2)).toDF("name", "v")
    dim.createOrReplaceTempView("__theta_dim")
    def run2(kql: String): DataFrame =
      KqlParser.parse(kql, n => if (n == "dim") dim else t)
    // inner with a colliding right column name (v → v1)
    val inner = run2(
      "t | join kind=inner (dim) on $left.user == $right.name | project user, v, v1")
    assert(inner.columns.toSeq == Seq("user", "v", "v1"))
    assert(inner.count() == 4) // alice×2 + bob×2
    // rightanti keeps right rows with no left match — none here; rightsemi both
    assert(run2("t | join kind=rightanti (dim) on $left.user == $right.name").count() == 0)
    val semi = run2("t | join kind=rightsemi (dim) on $left.user == $right.name")
    assert(semi.columns.toSeq == Seq("name", "v"))
    assert(semi.count() == 2)
  }

  test("as binds the pipeline mid-stream for later operands") {
    val n = run(
      """t | where v > 20 | as big
        || union big
        || summarize n = count()""".stripMargin).as[Long].collect().head
    assert(n == 6L) // 3 rows > 20, twice
  }

  test("lookup kind=inner drops unmatched fact rows") {
    val dim = Seq(("alice", "A")).toDF("user", "grp")
    val got = KqlParser.parse(
      "t | lookup kind=inner (dim) on user | project id, grp",
      n => if (n == "dim") dim else t)
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "A"), (3L, "A")))
    val outer = KqlParser.parse(
      "t | lookup (dim) on user | summarize n = count()",
      n => if (n == "dim") dim else t)
    assert(outer.as[Long].collect().head == 5L)
  }

  test("negated / case-variant predicates and render directive") {
    def ids(kql: String): Seq[Long] =
      run(s"t | where $kql | project id | sort by id asc").as[Long].collect().toSeq
    assert(ids("etype !contains 'LICK'") == Seq(2L, 4L))
    assert(ids("etype !startswith 'C'") == Seq(2L, 4L))
    assert(ids("etype !endswith 'ICK'") == Seq(2L, 4L))
    assert(ids("v !between (10.0 .. 60.0)") == Seq(4L, 5L))
    assert(ids("etype in~ ('CLICK', 'View')") == Seq(1L, 2L, 3L, 5L))
    assert(ids("etype !in~ ('CLICK', 'View')") == Seq(4L))
    assert(ids("etype !~ 'CLICK'") == Seq(2L, 4L))
    assert(ids("user !has 'ALICE'") == Seq(2L, 4L, 5L))
    assert(ids("user hasprefix 'AL'") == Seq(1L, 3L))
    assert(ids("user hassuffix 'ROL'") == Seq(4L))
    assert(ids("user has_cs 'alice'") == Seq(1L, 3L))
    assert(ids("user has_cs 'Alice'") == Seq())
    assert(ids("user hasprefix_cs 'al'") == Seq(1L, 3L))
    assert(ids("user hasprefix_cs 'Al'") == Seq())
    assert(ids("user hassuffix_cs 'rol'") == Seq(4L))
    // render is accepted and ignored
    assert(run("t | summarize n = count() by etype | render barchart with (title='x') | count")
      .as[Long].collect().head == 3L)
  }

  test("advice fixes: negative rotate, indexed split array, \\N capture refs, numeric in~") {
    val r = run(
      """t
        || where id == 1
        || extend a = pack_array(1, 2, 3, 4)
        || extend rl = strcat_array(array_rotate_left(a, -1), ';'),
        |    rr = strcat_array(array_rotate_right(a, -1), ';'),
        |    sp = split('a,b,c', ',', 1),
        |    spo = split('a,b,c', ',', 9),
        |    rx = replace_regex('ab12cd', '([a-z]+)(\\d+)', '\\2-\\1')
        || extend spn = array_length(sp), spon = array_length(spo),
        |    sps = tostring(sp[0])
        || project rl, rr, spn, sps, spon, rx""".stripMargin)
      .collect().head
    assert(r.getString(0) == "4;1;2;3") // rotate_left(-1) == rotate_right(1)
    assert(r.getString(1) == "2;3;4;1")
    assert(r.getLong(2) == 1L && r.getString(3) == "b") // indexed split → 1-elem array
    assert(r.getLong(4) == 0L) // OOB index → empty array
    assert(r.getString(5) == "12-abcd")
    // numeric in~ degrades to plain in (no lower(cast) mangling)
    assert(run("t | where id in~ (1, 3) | project id | sort by id asc")
      .as[Long].collect().toSeq == Seq(1L, 3L))
    assert(run("t | where id !in~ (1, 3) | project id | sort by id asc")
      .as[Long].collect().toSeq == Seq(2L, 4L, 5L))
  }

  test("search kind=case_sensitive changes the answer; search-in and find union tables") {
    val u = Seq((10L, "gamma", "X"), (11L, "DELTA", "Y"))
      .toDF("uid", "word", "tag")
    def both(n: String): DataFrame = n match {
      case "u" => u case _ => t
    }
    // case-insensitive finds both spellings; case-sensitive only the exact one
    assert(KqlParser.parse("u | search 'delta'", both).count() == 1)
    assert(KqlParser.parse("u | search kind=case_sensitive 'delta'", both).count() == 0)
    assert(KqlParser.parse("u | search kind=case_sensitive 'DELTA'", both).count() == 1)
    // cross-table search: per-table probes, source_ labels, null-fill union
    val multi = KqlParser.parse(
      "search in (t, u) 'alice' | project source_, id, uid", both)
    assert(multi.columns.toSeq == Seq("source_", "id", "uid"))
    val rows = multi.collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(rows == Set(("t", 1L, null), ("t", 3L, null)))
    // find: predicate over the aligned union; missing columns are null
    val found = KqlParser.parse(
      "find in (t, u) where v > 50 or uid > 10 | project source_, id, uid",
      both).collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(found == Set(("t", 4L, null), ("u", null, 11L)))
  }

  test("evaluate basket mines frequent attribute combinations with wildcards") {
    // 5 rows: click appears 3× (60% ≥ 50%), alice 2× (40% < 50%),
    // (click, alice) 2× (40% < 50%) — only single-attribute click survives,
    // plus every ≥50% band
    val seg = run(
      "t | evaluate basket(0.5, etype, user) | sort by count_ desc, etype asc, user asc")
      .select("etype", "user", "count_")
      .collect().map(r => (r.get(0), r.get(1), r.getLong(2))).toSeq
    assert(seg == Seq(("click", null, 3L)))
    // autocluster = basket at the 0.05 default: every present combination
    val auto = run("t | evaluate autocluster(etype) | sort by count_ desc, etype asc")
    assert(auto.columns.toSeq == Seq("etype", "count_", "percent"))
    val rows = auto.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("click", 3L, 60.0), ("purchase", 1L, 20.0), ("view", 1L, 20.0)))
  }

  test("round-7 scalar surface: shifts, element-wise series math, range/repeat") {
    val r = run(
      """t
        || where id == 1
        || extend a = pack_array(1, 2, 3), b = pack_array(3, 2, 1)
        || extend sl = strcat_array(array_shift_left(a, 1, 0), ';'),
        |    sr = strcat_array(array_shift_right(a, 1), ';'),
        |    srn = strcat_array(array_shift_left(a, -1, 9), ';'),
        |    ai = strcat_array(array_iff(pack_array(true, false, true), a, b), ';'),
        |    sad = strcat_array(series_add(a, b), ';'),
        |    sdv = strcat_array(series_divide(a, pack_array(2, 0, 2)), ';'),
        |    sgt = strcat_array(series_greater(a, b), ';'),
        |    rng = strcat_array(range(2, 8, 3), ';'),
        |    rep = strcat_array(repeat(7, 3), ';'),
        |    l2 = log2(8.0), e2 = exp2(5.0),
        |    ne = isnotempty('x'), ne2 = isnotempty('')
        || project sl, sr, srn, ai, sad, sdv, sgt, rng, rep, l2, e2, ne, ne2""".stripMargin)
      .collect().head
    assert(r.getString(0) == "2;3;0")
    assert(r.getString(1) == "1;2") // null fill: strcat_array drops nulls
    assert(r.getString(2) == "9;1;2") // negative left shift = right shift
    assert(r.getString(3) == "1;2;3") // iff picks a,b,a = 1,2,3
    assert(r.getString(4) == "4.0;4.0;4.0")
    assert(r.getString(5) == "0.5;Infinity;1.5")
    assert(r.getString(6) == "false;false;true")
    assert(r.getString(7) == "2;5;8")
    assert(r.getString(8) == "7;7;7")
    assert(r.getDouble(9) == 3.0 && r.getDouble(10) == 32.0)
    assert(r.getBoolean(11) && !r.getBoolean(12))
  }

  test("element-wise series family: libm members, seasonal, pow") {
    val r = run(
      """t
        || where id == 1
        || extend a = pack_array(1.0, 4.0, 9.0, 16.0)
        || extend ex = series_exp(pack_array(0.0, 1.0)),
        |    lg = series_log(a),
        |    sn = series_sin(pack_array(0.0)),
        |    cs = series_cos(pack_array(0.0)),
        |    tn = series_tan(pack_array(0.0)),
        |    ab = series_abs(pack_array(-3.5, 2.0)),
        |    sg = series_sign(pack_array(-3.5, 0.0, 2.0)),
        |    pw = series_pow(a, repeat(0.5, array_length(a))),
        |    se = series_seasonal(pack_array(1.0, 10.0, 3.0, 20.0), 2)
        || project e0 = todouble(ex[0]), e1 = todouble(ex[1]),
        |    l0 = todouble(lg[0]), s0 = todouble(sn[0]), c0 = todouble(cs[0]),
        |    t0 = todouble(tn[0]), a0 = todouble(ab[0]), g0 = todouble(sg[0]),
        |    g1 = todouble(sg[1]), p1 = todouble(pw[1]), p3 = todouble(pw[3]),
        |    m0 = todouble(se[0]), m1 = todouble(se[1]), m2 = todouble(se[2])""".stripMargin)
      .collect().head
    // codegen'd exp can differ from scala.math.exp by 1 ulp — tolerance, not
    // equality (the same reason these members stay out of driver oracle rows)
    assert(r.getDouble(0) == 1.0 && math.abs(r.getDouble(1) - math.exp(1.0)) < 1e-14)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 1.0 && r.getDouble(5) == 0.0)
    assert(r.getDouble(6) == 3.5)
    assert(r.getDouble(7) == -1.0 && r.getDouble(8) == 0.0)
    assert(r.getDouble(9) == 2.0 && r.getDouble(10) == 4.0) // sqrt via pow 0.5
    assert(r.getDouble(11) == 2.0 && r.getDouble(12) == 15.0 && r.getDouble(13) == 2.0)
  }

  test("series_iir: recursive filter matches the hand-unrolled recursion") {
    // y[0]=0.25*1, y[1]=0.25*2+0.5*1+0.5*y[0], y[2]=0.25*4+0.5*2+0.5*y[1] —
    // dyadic taps over integral inputs: every output exact in double
    val r = run(
      """t
        || where id == 1
        || extend y = series_iir(pack_array(1.0, 2.0, 4.0), dynamic([0.25, 0.5]), dynamic([1.0, -0.5]))
        || project y0 = todouble(y[0]), y1 = todouble(y[1]), y2 = todouble(y[2])""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 0.25)
    assert(r.getDouble(1) == 0.25 * 2 + 0.5 * 1 + 0.5 * 0.25)      // 1.125
    assert(r.getDouble(2) == 0.25 * 4 + 0.5 * 2 + 0.5 * 1.125)     // 2.5625
  }

  test("ipv4 family: parse/format round trip, masks, private ranges, boundaries") {
    val r = run(
      """t
        || where id == 1
        || extend p = parse_ipv4('192.168.1.1'),
        |    pm = parse_ipv4('192.168.1.77/24'),
        |    bad = parse_ipv4('300.1.2.3'),
        |    f = format_ipv4(3232235777),
        |    quarter_end = endofquarter(datetime('2024-02-10')),
        |    week_end = endofweek(datetime('2024-01-10')),
        |    priv1 = ipv4_is_private('10.1.2.3'), priv2 = ipv4_is_private('172.31.0.1'),
        |    priv3 = ipv4_is_private('172.32.0.1'), priv4 = ipv4_is_private('8.8.8.8'),
        |    in1 = ipv4_is_in_range('10.0.5.9', '10.0.0.0/16'),
        |    in2 = ipv4_is_in_range('10.1.5.9', '10.0.0.0/16'),
        |    in3 = ipv4_is_in_range('10.0.5.9', '10.0.5.9')
        || project p, pm, bad, f, quarter_end, week_end, priv1, priv2, priv3, priv4, in1, in2, in3""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 3232235777L)
    assert(r.getLong(1) == 3232235776L) // /24 zeroes the host octet
    assert(r.isNullAt(2))
    assert(r.getString(3) == "192.168.1.1")
    assert(r.getTimestamp(4).toString.startsWith("2024-03-31 23:59:59"))
    // 2024-01-10 is a Wednesday; KQL week ends Saturday 2024-01-13
    assert(r.getTimestamp(5).toString.startsWith("2024-01-13 23:59:59"))
    assert(r.getBoolean(6) && r.getBoolean(7) && !r.getBoolean(8) && !r.getBoolean(9))
    assert(r.getBoolean(10) && !r.getBoolean(11) && r.getBoolean(12))
  }

  test("parse-where drops non-matching rows; parse keeps them") {
    def lined = run(
      "t | extend line = iff(id % 2 == 1, strcat('u=', user, ';v=', tostring(id)), user)")
    val kept = KqlParser.parse(
      "x | parse line with 'u=' pu ';v=' pv:long | project id, pu, pv | sort by id asc",
      _ => lined)
    assert(kept.count() == 5) // plain parse keeps non-matching rows
    val filtered = KqlParser.parse(
      "x | parse-where line with 'u=' pu ';v=' pv:long | project id, pu, pv | sort by id asc",
      _ => lined)
    val rows = filtered.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "alice", 1L), (3L, "alice", 3L), (5L, "bob", 5L)))
  }

  test("make-graph / graph-match: hops, edge attrs, where/project, cycles") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 2L), ("a", "c", 3L), ("c", "a", 4L))
      .toDF("u", "v", "w")
    def g(kql: String) = KqlParser.parse(kql, _ => edges)
    val paths = g(
      """e | make-graph u --> v
        || graph-match (x)-[e1]->(y)-[e2]->(z)
        |  where z == 'c'
        |  project x, y, z, w1 = e1.w, w2 = e2.w
        || sort by w1 asc""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(paths == Seq(("a", "b", "c", 1L, 2L), ("c", "a", "c", 4L, 3L)))
    // repeated node variable closes a 2-cycle
    val cycles = g(
      """e | make-graph u --> v
        || graph-match (x)-[e1]->(y)-[e2]->(x) project x, y
        || sort by x asc""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cycles == Seq(("a", "c"), ("c", "a")))
    // graph-match without make-graph errors clearly
    intercept[IllegalArgumentException](g("e | graph-match (x)-[e1]->(y) project x"))
    // variable-length edge: paths of 1..2 hops from a to c, edge var = array
    val vl = g(
      """e | make-graph u --> v
        || graph-match (x)-[p*1..2]->(z)
        |  where x == 'a' and z == 'c'
        |  project hops = array_length(p)
        || sort by hops asc""".stripMargin)
      .as[Long].collect().toSeq
    assert(vl == Seq(1L, 2L)) // a->c direct, a->b->c
  }

  test("arg_max(x, *) expands the whole winning row per group") {
    val df = run("t | summarize arg_max(v, *) by etype | sort by etype asc")
    assert(df.columns.toSeq == Seq("etype", "id", "user", "v", "ts"))
    val rows = df.select("etype", "id").as[(String, Long)].collect().toSeq
    assert(rows == Seq(("click", 3L), ("purchase", 4L), ("view", 2L)))
    // named form + arg_min
    val named = run("t | summarize w = arg_min(v, *) | project id, user")
      .as[(Long, String)].collect().head
    assert(named == ((5L, "bob")))
  }

  test("pivot with an explicit group-column list restricts the group set") {
    val df = run("t | evaluate pivot(etype, sum(v), user) | sort by user asc")
    assert(df.columns.toSeq == Seq("user", "click", "purchase", "view"))
    val alice = df.filter(col("user") === "alice").collect().head
    assert(alice.getDouble(1) == 60.0 && alice.isNullAt(2) && alice.isNullAt(3))
  }

  test("top-nested asc selects the bottom keys") {
    val bottom = run("t | top-nested 1 of etype by s = sum(v) asc")
      .select("etype").as[String].collect().toSeq
    assert(bottom == Seq("view")) // sums: click 67.25, purchase 99, view 25.5
    val top = run("t | top-nested 1 of etype by s = sum(v)")
      .select("etype").as[String].collect().toSeq
    assert(top == Seq("purchase"))
  }

  test("parse kind=regex treats literals as raw regex with aligned captures") {
    val df = run(
      """t | extend s = strcat('k', tostring(id), '#x')
        || parse kind=regex s with '(k|q)' n:long '#' rest
        || project id, n, rest | sort by id asc""".stripMargin)
    val rows = df.as[(Long, Long, String)].collect()
    assert(rows.forall { case (id, n, rest) => n == id && rest == "x" })
    // kind=simple quotes the same literal, so nothing matches
    val simple = run(
      """t | extend s = strcat('k', tostring(id), '#x')
        || parse-where s with '(k|q)' n:long '#' rest""".stripMargin)
    assert(simple.count() == 0)
  }

  test("indexof / array_index_of with start offsets") {
    val r = run(
      """t | take 1
        || extend a = indexof('abcabc', 'b'), b = indexof('abcabc', 'b', 2),
        |    c = indexof('abcabc', 'z', 1),
        |    d = array_index_of(pack_array(5, 7, 5), 5),
        |    e = array_index_of(pack_array(5, 7, 5), 5, 1),
        |    f = array_index_of(pack_array(5, 7, 5), 9, 1),
        |    g = array_index_of(pack_array(5, 7, 5), 5, -2),
        |    h = array_index_of(pack_array(5, 7, 5), 5, -9)
        || project a, b, c, d, e, f, g, h""".stripMargin).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == -1L)
    assert(r.getLong(3) == 0L && r.getLong(4) == 2L && r.getLong(5) == -1L)
    assert(r.getAs[Number](0).longValue == 1L)
    // negative start = offset from the END (Kusto): -2 searches the last two
    // elements; a before-the-start offset clamps to 0 (whole array)
    assert(r.getLong(6) == 2L && r.getLong(7) == 0L)
  }

  test("array_sort_asc/desc multi-array form reorders companions by the key order") {
    val r = run(
      """t | take 1
        || extend k = pack_array(3, 1, 2), c = pack_array(30, 10, 20)
        || extend s = array_sort_asc(k, c), d = array_sort_desc(k, c)
        || project s, d""".stripMargin).collect().head
    assert(r.getSeq[Seq[Long]](0) == Seq(Seq(1L, 2L, 3L), Seq(10L, 20L, 30L)))
    assert(r.getSeq[Seq[Long]](1) == Seq(Seq(3L, 2L, 1L), Seq(30L, 20L, 10L)))
  }

  test("array_sort_desc: ties keep original position, nulls last") {
    val r = run(
      """t | take 1
        || extend k = pack_array(2, 1, 2), c = pack_array(20, 10, 21)
        || extend d = array_sort_desc(k, c),
        |    sn = array_sort_desc(dynamic([4, null, 9])),
        |    s1 = array_sort_desc(pack_array(7)),
        |    s3 = array_sort_desc(pack_array(1, 3, 2))
        || project d, sn, s1, s3""".stripMargin).collect().head
    // tied keys (2, 2) keep original order → companions 20 then 21 (a
    // reverse(asc) would have swapped them)
    assert(r.getSeq[Seq[Long]](0) == Seq(Seq(2L, 2L, 1L), Seq(20L, 21L, 10L)))
    // null keys sort LAST in desc (Kusto default), not first
    assert(r.getSeq[Any](1) == Seq(9L, 4L, null))
    assert(r.getSeq[Long](2) == Seq(7L))
    assert(r.getSeq[Long](3) == Seq(3L, 2L, 1L))
  }

  test("parse kind=regex flags= maps i/s inline and rejects unknown flags") {
    val r = run(
      """t | where id == 1
        || extend s = strcat('K(', tostring(id))
        || parse kind=regex flags=i s with '(k|q)[(]' n:long
        || project n""".stripMargin).collect().head
    // flags=i matches the upper-case K; the char-class '[(]' must stay a
    // class (the old lookaround rewrite turned it into '[(?:]') and the
    // user alternation group '(k|q)' must become non-capturing
    assert(r.getLong(0) == 1L)
    assertThrows[IllegalArgumentException](run(
      "t | parse kind=regex flags=U s with '(k)' n:long"))
  }

  test("take_any(*) expands a deterministic whole row per group") {
    val df = run("t | summarize take_any(*) by etype | sort by etype asc")
    assert(df.columns.toSeq == Seq("etype", "id", "user", "v", "ts"))
    val rows = df.select("etype", "id").as[(String, Long)].collect().toSeq
    assert(rows == Seq(("click", 1L), ("purchase", 4L), ("view", 2L)))
  }

  test("percentiles() expands to Kusto-named columns; dynamic bag literal") {
    val df = run("t | summarize percentiles(v, 25, 50, 99.9)")
    assert(df.columns.toSeq ==
      Seq("percentile_v_25", "percentile_v_50", "percentile_v_99_9"))
    val p = run("t | summarize p = percentiles(v, 50) by etype | sort by etype asc")
    assert(p.columns.toSeq == Seq("etype", "percentile_v_50"))
    val bag = run("t | take 1 | extend b = dynamic({'k': 7, 'z': 'x'}) " +
      "| project kv = b.k, zv = b['z']").collect().head
    assert(bag.get(0).toString == "7" && bag.get(1).toString == "x")
  }

  test("summarize accepts and ignores physical hints") {
    val n = run("t | summarize hint.shufflekey=user hint.strategy=shuffle n = count() by user")
      .count()
    assert(n == 3L)
  }

  test("mv-expand over a bag yields one row per property as key/value columns") {
    val rows = run(
      """t | where id == 1
        || extend b = bag_pack('x', 1, 'y', 2)
        || mv-expand b
        || project b_key, b_value
        || sort by b_key asc""".stripMargin)
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("x", "1"), ("y", "2")))
  }

  test("make_list_if / make_set_if collect only matching rows") {
    val r = run(
      """t | summarize l = make_list_if(id, v > 20), s = make_set_if(user, v > 20)""")
      .as[(Seq[Long], Seq[String])].collect().head
    assert(r._1.sorted == Seq(2L, 3L, 4L))
    assert(r._2 == Seq("alice", "bob", "carol"))
  }

  test("ipv4_compare/is_match, replace_strings, regex_quote, estimate_data_size") {
    val r = run(
      """t | where id == 1
        || extend c = ipv4_compare('10.1.2.7', '10.128.0.0/9'),
        |    c2 = ipv4_compare('10.200.2.7', '10.128.0.0/9'),
        |    m = ipv4_is_match('10.1.2.3', '10.1.200.200', 16),
        |    rs = replace_strings('banana', dynamic(['a', 'n']), dynamic(['o', 'p'])),
        |    rq = regex_quote('a.b*c'),
        |    sz = estimate_data_size(user, id)
        || project c, c2, m, rs, rq, sz""".stripMargin).collect().head
    assert(r.getLong(0) == -1L && r.getLong(1) == 0L && r.getBoolean(2))
    assert(r.getString(3) == "bopopo")   // a→o first, THEN n→p over the result
    assert(r.getString(4) == "a\\.b\\*c")
    assert(r.getInt(5) == 8)             // "alice"+1 + "1"+1
  }

  test("bin_auto uses the let-bound query_bin_auto_size") {
    val bs = run("let query_bin_auto_size = 10; t | extend b = bin_auto(id * 7) | project b | sort by b asc")
      .as[Long].collect().toSeq
    assert(bs == Seq(0L, 10L, 20L, 20L, 30L))
  }

  test("covariance family matches the closed form cov(x, 2x) = 2·var(x)") {
    val r = run(
      """t | summarize c = covariance(id, id * 2), cp = covariancep(id, id * 2),
        |    ci = covarianceif(id, id * 2, id <= 3),
        |    cpi = covariancepif(id, id * 2, id <= 3)""".stripMargin)
      .as[(Double, Double, Double, Double)].collect().head
    assert(r == ((5.0, 4.0, 2.0, 4.0 / 3.0)))
  }

  test("make_bag merges bags deterministically (sorted first-wins)") {
    val m = run("t | extend bag = bag_pack(user, etype) | summarize mb = make_bag(bag)")
      .collect().head.getMap[String, String](0)
    assert(m == Map("alice" -> "click", "bob" -> "click", "carol" -> "purchase"))
  }

  test("percentilesw expands to exact weighted percentiles") {
    val df = run("t | summarize p = percentilesw(v, toint(id), 50, 100)")
    assert(df.columns.toSeq == Seq("percentilew_v_50", "percentilew_v_100"))
    val r = df.as[(Double, Double)].collect().head
    assert(r == ((25.5, 99.0)))   // weights 1..5 by id, total 15, target 7.5
  }

  test("zlib/gzip codec scalars roundtrip; malformed input yields empty string") {
    val r = run(
      """t | where id == 2
        || extend z = zlib_decompress_from_base64_string(zlib_compress_to_base64_string(strcat(user, '/', etype))),
        |    g = gzip_decompress_from_base64_string(gzip_compress_to_base64_string(user)),
        |    zl = zlib_decompress_from_base64_string('eJwryUhVKCzNTM5WSCrKL89TSMuvUMgqzS0oVsgvSy1SMDRWyEmsqlRIyU8vBgBbjA+Q'),
        |    bz = zlib_decompress_from_base64_string('AAAA'),
        |    bg = gzip_decompress_from_base64_string('%%%')
        || project z, g, zl, bz, bg""".stripMargin).collect().head
    assert(r.getString(0) == "bob/view" && r.getString(1) == "bob")
    assert(r.getString(2) == "the quick brown fox jumps over 13 lazy dogs")
    assert(r.getString(3) == "" && r.getString(4) == "")
  }

  test("sort by ... nulls first/last overrides the default placement") {
    val ascFirst = run(
      "t | extend v2 = iff(id == 2, null, v) | sort by v2 asc nulls first | project id")
      .as[Long].collect()
    assert(ascFirst.head == 2L)
    val ascLast = run(
      "t | extend v2 = iff(id == 2, null, v) | sort by v2 asc nulls last | project id")
      .as[Long].collect()
    assert(ascLast.last == 2L)
    val descFirst = run(
      "t | extend v2 = iff(id == 2, null, v) | sort by v2 desc nulls first | project id")
      .as[Long].collect()
    assert(descFirst.head == 2L)
  }

  test("punycode: RFC 3492 vectors, roundtrip, all-ascii, malformed") {
    val r = run(
      """t | where id == 1
        || extend a = punycode_from_string('bücher'), b = punycode_from_string('München'),
        |    c = punycode_to_string('Mnchen-3ya'), d = punycode_from_string('abc'),
        |    e = punycode_to_string(punycode_from_string('ü東京x')),
        |    f = punycode_to_string('!!!'),
        |    g = punycode_to_string('-tda'), h = punycode_to_string('tda')
        || project a, b, c, d, e, f, g, h""".stripMargin).collect().head
    assert(r.getString(0) == "bcher-kva")
    assert(r.getString(1) == "Mnchen-3ya")
    assert(r.getString(2) == "München")
    assert(r.getString(3) == "abc-")
    assert(r.getString(4) == "ü東京x")
    assert(r.getString(5) == "")
    // RFC 3492 delimiter rule: a LEADING delimiter marks an empty basic
    // string — '-tda' and 'tda' both decode the extended-only body
    assert(r.getString(6) == "ü" && r.getString(7) == "ü")
  }

  test("now/ago are current and ordered") {
    val r = run("t | take 1 | extend n = now(), a = ago(5m) | project n, a")
      .collect().head
    assert(r.getTimestamp(0).after(r.getTimestamp(1)))
    assert(math.abs(r.getTimestamp(0).getTime - System.currentTimeMillis()) < 60000)
  }

  test("inverse trig, cot, not(), gamma/loggamma (transcendental parity)") {
    val r = run(
      """t | take 1
        || extend ac = acos(0.5), as0 = asin(1.0), at = atan(1.0), ct = cot(1.0),
        |    nb = not(true), g5 = gamma(5), gh = gamma(0.5), gn = gamma(-0.5),
        |    lg10 = loggamma(10), lgs = loggamma(0.25)
        || project ac, as0, at, ct, nb, g5, gh, gn, lg10, lgs""".stripMargin)
      .collect().head
    assert(math.abs(r.getDouble(0) - math.acos(0.5)) < 1e-14)
    assert(math.abs(r.getDouble(1) - math.Pi / 2) < 1e-14)
    assert(math.abs(r.getDouble(2) - math.Pi / 4) < 1e-14)
    assert(math.abs(r.getDouble(3) - 1.0 / math.tan(1.0)) < 1e-14)
    assert(!r.getBoolean(4))
    assert(math.abs(r.getDouble(5) - 24.0) < 1e-10)                  // Γ(5) = 4!
    assert(math.abs(r.getDouble(6) - math.sqrt(math.Pi)) < 1e-12)    // Γ(1/2) = √π
    assert(math.abs(r.getDouble(7) - (-2.0 * math.sqrt(math.Pi))) < 1e-11) // Γ(-1/2)
    assert(math.abs(r.getDouble(8) - math.log(362880.0)) < 1e-10)    // ln 9!
    assert(math.abs(r.getDouble(9) - 1.2880225246980774) < 1e-10)    // ln Γ(1/4)
  }

  test("convert_* families: exact factors, affine temperature, unknown unit throws") {
    val r = run(
      """t | take 1
        || extend m = convert_length(2.0, 'Mile', 'Kilometer'),
        |    kg = convert_mass(32.0, 'Ounce', 'Kilogram'),
        |    c = convert_temperature(212.0, 'Fahrenheit', 'Celsius'),
        |    kn = convert_speed(1.0, 'Knot', 'MeterPerSecond'),
        |    gr = convert_angle(200.0, 'Gradian', 'Revolution')
        || project m, kg, c, kn, gr""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 3.218688) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.90718474) < 1e-12)
    assert(math.abs(r.getDouble(2) - 100.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 1852.0 / 3600) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-12)
    assertThrows[IllegalArgumentException](
      run("t | extend x = convert_length(1.0, 'Parsec', 'Meter')"))
  }

  test("rank_tdigest / percentrank_tdigest are exact on unit buckets") {
    val r = run(
      """t | summarize td = tdigest(id, 1, 6, 5)
        || project r3 = rank_tdigest(td, 3), pr3 = percentrank_tdigest(td, 3),
        |    r5 = rank_tdigest(td, 5)""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 60.0)   // ids 1..5: 3 of 5 ≤ 3
    assert(r.getDouble(1) == 40.0)   // 2 of 5 < 3
    assert(r.getDouble(2) == 100.0)
  }

  test("graph-mark-components labels weak components; graph-to-table emits both views") {
    // two components: {1,2,3} (1->2->3) and {4,5} (4->5)
    val nodes = run(
      """t | where id <= 4 | extend dst = iff(id == 3, 1, id + 1)
        || make-graph id --> dst
        || graph-mark-components with_component_id=cid
        || graph-to-table nodes
        || sort by node asc""".stripMargin).collect()
    assert(nodes.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
    val edges = run(
      """t | where id <= 2 | project id | extend dst = id + 1
        || make-graph id --> dst
        || graph-to-table edges""".stripMargin)
    assert(edges.columns.toSeq == Seq("id", "dst") && edges.count() == 2)
    assertThrows[IllegalArgumentException](
      run("t | make-graph id --> v | graph-mark-components kind=strong"))
  }

  test("percentiles_array / percentilesw_array return ordered dynamic arrays") {
    val r = run(
      """t | summarize pa = percentiles_array(v, 0, 100),
        |    pw = percentilesw_array(v, 1, 100)""".stripMargin).collect().head
    assert(r.getSeq[Double](0) == Seq(7.25, 99.0))
    assert(r.getSeq[Double](1) == Seq(99.0))
  }

  test("evaluate rows_near keeps the window around each anchor, deduped") {
    // anchor = id 4 (purchase); 1 before + 1 after => ids 3, 4, 5
    val r = run(
      """t | sort by id asc | serialize
        || evaluate rows_near(etype == 'purchase', 1)
        || sort by id asc""".stripMargin)
    assert(r.select("id").as[Long].collect().toSeq == Seq(3L, 4L, 5L))
    // asymmetric window: 0 before, 2 after => ids 4, 5 (clipped at the end)
    val r2 = run(
      """t | sort by id asc | serialize
        || evaluate rows_near(etype == 'purchase', 0, 2)
        || sort by id asc""".stripMargin)
    assert(r2.select("id").as[Long].collect().toSeq == Seq(4L, 5L))
    // overlapping anchors (every click) emit each row at most once
    val r3 = run(
      """t | sort by id asc | serialize
        || evaluate rows_near(etype == 'click', 2, 2)""".stripMargin)
    assert(r3.count() == 5)
    // serialized order is mandatory
    assertThrows[IllegalArgumentException](
      run("t | evaluate rows_near(etype == 'click', 1)"))
  }

  test("geo_polygon area/perimeter/centroid invariants on a unit square") {
    val r = run(
      """t | take 1
        || extend ring = pack_array(pack_array(0.0, 0.0), pack_array(1.0, 0.0),
        |    pack_array(1.0, 1.0), pack_array(0.0, 1.0), pack_array(0.0, 0.0))
        || project a = geo_polygon_area(ring), p = geo_polygon_perimeter(ring),
        |    cx = todouble(geo_polygon_centroid(ring)[0]),
        |    cy = todouble(geo_polygon_centroid(ring)[1])""".stripMargin)
      .as[(Double, Double, Double, Double)].collect().head
    // 1°×1° at the equator ≈ 111.19 km per side
    assert(math.abs(r._1 / 1e6 - 12364.0) < 10.0, s"area ${r._1 / 1e6} km2")
    assert(math.abs(r._2 - 4 * 111194.9) < 200.0, s"perimeter ${r._2}")
    assert(math.abs(r._3 - 0.5) < 1e-9 && math.abs(r._4 - 0.5) < 1e-9)
  }

  test("has_any / in accept spliced dynamic([...]) literal arrays") {
    assert(run("t | where etype has_any (dynamic(['view', 'purchase']))")
      .count() == 2)
    assert(run("t | where user in (dynamic(['alice', 'bob']), 'carol')")
      .count() == 5)
  }

  test("review fixes: dynamic-array has_any_ipv4, bag typed expand, hash_many") {
    val r = run(
      "t | take 1 | project " +
        "a = has_any_ipv4('x 10.0.0.1 y', dynamic(['10.0.0.1', '9.9.9.9'])), " +
        "b = has_any_ipv4('x 8.8.8.8 y', dynamic(['10.0.0.1'])), " +
        "c = hash_many('a|b', 'c') != hash_many('a', 'b|c')").collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2), "length-prefixing must separate tuple boundaries")
    // typed mv-expand of a bag casts the VALUE column instead of crashing
    val m = run(
      """t | take 1 | extend b = bag_pack('k', id)
        || mv-expand b to typeof(string)
        || project b_key, b_value""".stripMargin).collect().head
    assert(m.getString(0) == "k" && m.getString(1) == "1")
  }

  test("line comments are stripped (exported-query compatibility)") {
    val r = run(
      """// leading comment
        |t // trailing comment
        || where id > 1 // another
        || count""".stripMargin)
    assert(r.collect().head.getLong(0) == 4L)
  }

  test("set statements parse and are ignored") {
    assert(run("set notruncation; set truncationmaxsize = 1048576; t | count")
      .collect().head.getLong(0) == 5L)
  }

  test("multi-column mv-expand zips with null padding; typed casts apply") {
    val r = run(
      """t | take 1
        || extend a = pack_array(1, 2, 3), b = pack_array('x', 'y')
        || mv-expand a to typeof(long), b to typeof(string)
        || project a, b""".stripMargin)
      .collect().map(x => (x.get(0), x.get(1))).toSeq
    assert(r == Seq((1L, "x"), (2L, "y"), (3L, null)))
    // a NULL operand pads with nulls instead of annihilating the row
    val n = run(
      """t | take 1
        || extend a = pack_array(1, 2), b = iff(1 == 2, pack_array('x'), dynamic(null))
        || mv-expand a, b
        || project a, b""".stripMargin)
      .collect().map(x => (x.get(0), x.get(1))).toSeq
    assert(n.size == 2 && n.map(_._2).forall(_ == null),
      s"null operand must pad, got $n")
  }

  test("nested sub-parse distinct key does not leak into the outer aggregate (lean rewrite)") {
    // the toscalar sub-query contains a dcount — its distinct key must NOT
    // reclassify the outer countif as a distinct aggregate
    val r = run(
      """t | summarize n = countif(id > toscalar(t | summarize dcount(etype))),
        |    s = sum(id) by etype
        || sort by etype asc""".stripMargin)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    // dcount(etype) over t = 3 (click, purchase, view); ids 4,5 exceed it
    assert(r.map(_._2).sum == 2, s"countif leaked: $r")
    assert(r.map(_._3).sum == 15L)
  }

  test("multi-column mv-expand pads a null VARIANT operand") {
    val r = run(
      """t | take 1
        || extend a = parse_json('[1, 2]'),
        |    b = iff(1 == 2, parse_json('[9]'), parse_json('3'))
        || mv-expand a to typeof(long), b
        || project a, bn = isnull(b)""".stripMargin)
      .collect().map(x => (x.get(0), x.get(1))).toSeq
    assert(r.map(_._1) == Seq(1L, 2L), s"got $r")
    assert(r.map(_._2) == Seq(true, true), "non-array variant must pad as null")
  }

  test("parenthesized extend expression still parses (no tuple-path capture)") {
    val r = run("t | take 1 | extend y = (id + 1), (id * 2) | project y")
      .collect().head
    assert(r.getLong(0) == 2L)
  }

  test("row_number(start[, restart]); make_datetime/timespan; table(); misc") {
    val rn = run(
      """t | sort by id asc | serialize
        || extend r = row_number(10), rr = row_number(1, etype == 'click')
        || project id, r, rr | sort by id asc""".stripMargin)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rn.map(_._2) == Seq(10L, 11L, 12L, 13L, 14L))
    // etypes by id: click view click purchase click → restart at each click
    assert(rn.map(_._3) == Seq(1L, 2L, 1L, 2L, 1L))
    val m = run(
      "t | take 1 | project md = tostring(make_datetime(2024, 3, 15, 10, 30, 15)), " +
        "ts1 = make_timespan(1, 2, 3, 4), ts2 = make_timespan(2, 30), " +
        "g = base64_decode_toguid('ABEiM0RVZneImaq7zN3u/w=='), " +
        "cdb = current_database()").collect().head
    assert(m.getString(0) == "2024-03-15 10:30:15")
    assert(m.getLong(1) == 93784L && m.getLong(2) == 9000L)
    // .NET mixed-endian: bytes 0-3, 4-5, 6-7 reversed in the first groups
    assert(m.getString(3) == "33221100-5544-7766-8899-aabbccddeeff")
    assert(m.getString(4) == "default")
    assert(KqlParser.parse("table('t') | count", _ => t)
      .collect().head.getLong(0) == 5L)
  }

  test("geo_geohash_neighbors matches the public adjacency map") {
    // cell 'u' (lat 45..90, lng 0..45) is on the north edge: 5 neighbors,
    // row-major (dLat, dLng) order → sw, s, se, w, e = e, s, t, g, v
    val r = run(
      "t | take 1 | project n = strcat_array(geo_geohash_neighbors('u'), ';')")
      .collect().head
    assert(r.getString(0) == "e;s;t;g;v")
    val n2 = run(
      "t | take 1 | project n = array_length(geo_geohash_neighbors('gbsuv'))")
      .collect().head
    assert(n2.getAs[Number](0).intValue == 8)
  }

  test("series_fft/ifft spikes match hand-computed DFT; tuple extend binds") {
    val r = run(
      """t | take 1
        || extend x = pack_array(1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0, 0.0)
        || extend (fr, fi) = series_fft(x)
        || extend (rr, ri) = series_ifft(fr, fi)
        || project f2 = round(todouble(fr[2]), 6), f6 = round(todouble(fr[6]), 6),
        |    f0 = round(abs(todouble(fr[0])), 6), i2 = round(abs(todouble(fi[2])), 6),
        |    rt = round(abs(todouble(rr[0]) - 1.0), 9), ri0 = round(abs(todouble(ri[0])), 9)""".stripMargin)
      .collect().head
    // cos(2πk/4) over N=8 → real spikes N/2 = 4 at bins 2 and 6, 0 elsewhere
    assert(r.getDouble(0) == 4.0 && r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
    // sin(2πk/4) over N=4 → imaginary spikes ∓2 at bins 1 and 3
    val s = run(
      """t | take 1
        || extend x = pack_array(0.0, 1.0, 0.0, -1.0)
        || extend (fr, fi) = series_fft(x)
        || project a = round(todouble(fi[1]), 6), b = round(todouble(fi[3]), 6)""".stripMargin)
      .collect().head
    assert(s.getDouble(0) == -2.0 && s.getDouble(1) == 2.0)
    // zero-padding: length 3 pads to 4; bin 0 = the plain sum
    val p = run(
      """t | take 1
        || extend (fr, fi) = series_fft(pack_array(1.0, 2.0, 3.0))
        || project n = array_length(fr), s0 = round(todouble(fr[0]), 6)""".stripMargin)
      .collect().head
    assert(p.getAs[Number](0).intValue == 4 && p.getDouble(1) == 6.0)
  }

  test("startof*/endof* offset argument; punycode domain variants") {
    val r = run(
      "t | take 1 | project " +
        "a = tostring(startofday(datetime('2024-03-15 13:22:11'), 2)), " +
        "b = tostring(endofmonth(datetime('2024-01-10'), 1)), " +
        "c = tostring(startofweek(datetime('2024-03-15'), -1)), " +
        "d = punycode_domain_from_string('m\u00FCnchen.example.com'), " +
        "e = punycode_domain_to_string('xn--mnchen-3ya.example.com')")
      .collect().head
    assert(r.getString(0) == "2024-03-17 00:00:00")
    assert(r.getString(1) == "2024-02-29 23:59:59.999999")
    assert(r.getString(2) == "2024-03-03 00:00:00") // week starts Sunday
    assert(r.getString(3) == "xn--mnchen-3ya.example.com") // published IDNA vector
    assert(r.getString(4) == "m\u00FCnchen.example.com")
  }

  test("text_normalize_nfc/nfkc published vectors; bag_unpack column prefix") {
    val kql = "t | take 1 | project a = text_normalize_nfc('Cafe\u0301'), " +
      "b = text_normalize_nfkc('\uFB01 \u2460 \uFB00'), " +
      "c = strlen(text_normalize_nfc('A\u030A'))"
    val r = run(kql).collect().head
    assert(r.getString(0) == "Caf\u00E9")       // NFC composes e + U+0301
    assert(r.getString(1) == "fi 1 ff")          // NFKC folds fi-lig, circled-1, ff-lig
    assert(r.getAs[Number](2).intValue == 1)     // A + U+030A composes to one char
    val b = run(
      """t | take 2 | extend j = strcat('{"k1":', tostring(id), ',"k2":"x"}')
        || project j
        || evaluate bag_unpack(j, 'p_')
        || sort by p_k1 asc""".stripMargin)
    assert(b.columns.toSeq == Seq("p_k1", "p_k2"))
    assert(b.count() == 2)
  }

  test("ipv6_lookup masks at non-nibble boundaries and picks longest prefix") {
    // /41 = 10 full hex digits + 1 bit: 0x4 (0100) and 0x7 (0111) share the
    // top bit (0), 0xc (1100) does not
    val probe = Seq("2001:db8:ab7f::1", "2001:db8:abc0::1", "2001:db8:ab42::9")
      .toDF("ip") // built eagerly: initializes the session before parse
    val r = KqlParser.parse(
      """let r6 = datatable(network:string, tag:string) [
        |  '2001:db8:ab42::/41', 'narrow',
        |  '2001:db8::/32', 'wide'
        |];
        |probe
        || evaluate ipv6_lookup(r6, ip, network)
        || project ip, tag
        || sort by ip asc""".stripMargin,
      _ => probe)
    assert(r.as[(String, String)].collect().toSeq == Seq(
      ("2001:db8:ab42::9", "narrow"),
      ("2001:db8:ab7f::1", "narrow"),
      ("2001:db8:abc0::1", "wide")))
  }

  test("parse_xml: elements, attrs, arrays, entities, CDATA; malformed → null") {
    // tostring(variant) prints objects with SORTED keys — the expected
    // literals below are the canonical mapping re-sorted ("#text" < "@attr")
    val r = run(
      """t | take 1 | project
        |  j1 = tostring(parse_xml('<c><a>1</a><a>2</a><b at="v">t</b></c>')),
        |  j2 = tostring(parse_xml('<?xml version="1.0"?><c s="ok"><e/></c>')),
        |  j3 = tostring(parse_xml('<m>hi &amp; &#65;</m>')),
        |  j4 = tostring(parse_xml('<r><![CDATA[raw <x> ]]>tail<!-- c --></r>')),
        |  j5 = tostring(parse_xml('<c><a>x</a'))""".stripMargin)
      .collect().head
    assert(r.getString(0) == """{"c":{"a":["1","2"],"b":{"#text":"t","@at":"v"}}}""")
    assert(r.getString(1) == """{"c":{"@s":"ok","e":null}}""")
    assert(r.getString(2) == """{"m":"hi & A"}""")
    assert(r.getString(3) == """{"r":"raw <x> tail"}""")
    assert(r.isNullAt(4))
  }

  test("union wildcard patterns expand against the catalog; no match fails") {
    // 'par*' expands to the part table only; t has disjoint columns => null-fill
    val u = KqlParser.parse("union withsource=src t, nat*",
      n => if (n == "t") t else graft.sources.Tables.resolver(spark, sf)(n))
    assert(u.columns.contains("src"))
    assertThrows[IllegalArgumentException](
      KqlParser.parse("union zzz*", _ => t))
  }

  test("geo lookup plugin options: return_lookup_key and lookup_area_radius") {
    assert(spark.sparkContext.isLocal) // force session init before parse
    val q =
      """let polys = datatable(pid: long) [1]
        || extend poly = pack_array(pack_array(-0.5, -0.5),
        |    pack_array(0.5, -0.5), pack_array(0.0, 0.5));
        |t | project id | extend lng = 0.0, lat = 0.0
        || evaluate geo_polygon_lookup(polys, poly, lng, lat%s)""".stripMargin
    // default: the lookup key (polygon) column is omitted (Kusto default)
    val noKey = KqlParser.parse(q.format(""), _ => t)
    assert(!noKey.columns.contains("poly") && noKey.columns.contains("pid"))
    assert(noKey.count() == t.count())
    // return_lookup_key keeps it; lookup_area_radius is accepted and ignored
    val withKey = KqlParser.parse(
      q.format(", 1000.0, return_unmatched = false, 99.0, return_lookup_key"), _ => t)
    assert(withKey.columns.contains("poly"))
    assert(withKey.count() == t.count())
  }

  test("geo lookup plugins tolerate an empty lookup table") {
    assert(spark.sparkContext.isLocal)
    val base =
      """let polys = datatable(pid: long) [1]
        || extend poly = pack_array(pack_array(-0.5, -0.5),
        |    pack_array(0.5, -0.5), pack_array(0.0, 0.5))
        || where pid > 99;
        |t | project id | extend lng = 0.0, lat = 0.0
        || evaluate geo_polygon_lookup(polys, poly, lng, lat%s)""".stripMargin
    // inner: zero rows, schema still carries the lookup columns
    val inner = KqlParser.parse(base.format(""), _ => t)
    assert(inner.count() == 0 && inner.columns.contains("pid"))
    // unmatched: every fact row kept, lookup columns null
    val um = KqlParser.parse(base.format(", return_unmatched"), _ => t)
    assert(um.count() == t.count())
    assert(um.where(org.apache.spark.sql.functions.col("pid").isNull).count() == t.count())
  }

  test("evaluate accepts and ignores hint.distribution") {
    val r = KqlParser.parse(
      """t | project id, d = '{"k": 1}'
        || evaluate hint.distribution = per_node bag_unpack(d)""".stripMargin, _ => t)
    assert(r.columns.contains("k") && r.count() == t.count())
  }

  test("make_string/to_utf8 edges: invalid codepoint null, empty, round-trip") {
    val r = KqlParser.parse(
      """t | take 1 | project
        |  bad = make_string(pack_array(2000000)),
        |  neg = make_string(pack_array(-1)),
        |  empty = make_string(pack_array()),
        |  uni = make_string(to_utf8('ascii only here')),
        |  nb = array_length(to_utf8('€'))""".stripMargin, _ => t)
      .collect().head
    assert(r.isNullAt(0), "codepoint beyond U+10FFFF must null")
    assert(r.isNullAt(1), "negative codepoint must null")
    assert(r.getString(2) == "")
    assert(r.getString(3) == "ascii only here")
    assert(r.getLong(4) == 3L, "euro sign is 3 UTF-8 bytes")
  }

  test("round-12 scalar edges: parse_command_line quoting, around bounds, " +
      "union_lines null, bag_pack_columns keys") {
    val r = run(
      """t | take 1 | project
        |  argv = parse_command_line('  a.exe  "x  y" ""  tail', 'windows'),
        |  inb = around(10.0, 12.0, 2.0),
        |  outb = around(10.0, 12.0, 1.999),
        |  ul = geo_union_lines_array(pack_array(pack_array(pack_array(1.0, 2.0)))),
        |  b = bag_pack_columns(id, v)""".stripMargin)
      .collect().head
    // quoted token keeps its double space; the empty "" token survives as ""
    assert(r.getSeq[String](0) == Seq("a.exe", "x  y", "", "tail"))
    assert(r.getBoolean(1), "|10−12| = 2 is inside delta 2")
    assert(!r.getBoolean(2), "delta below the gap must be outside")
    assert(r.isNullAt(3), "all-degenerate lines array must union to null")
    assert(r.getMap[String, String](4) == Map("id" -> "1", "v" -> "10.0"))
  }

  test("series_periods_validate echoes the requested periods in order") {
    val r = run(
      """t | summarize s = make_list(v) | project
        |  pv = series_periods_validate(s, 2, 4)""".stripMargin)
      .select(col("pv.periods"), col("pv.scores")).collect().head
    assert(r.getSeq[Long](0) == Seq(2L, 4L))
    assert(r.getSeq[Double](1).length == 2)
  }

  test("consume discards rows keeping schema; hash_xxhash64 is builtin xxhash64") {
    val c = KqlParser.parse("t | project id | extend b = id + 1 | consume", _ => t)
    assert(c.count() == 0 && c.columns.toSeq == Seq("id", "b"))
    val cd = KqlParser.parse("t | consume decodeblocks = true", _ => t)
    assert(cd.count() == 0)
    val r = KqlParser.parse(
      "t | extend h = hash_xxhash64(tostring(id)), hm = hash_xxhash64(tostring(id), 10)",
      _ => t)
    val rows = r.select(org.apache.spark.sql.functions.col("h") ===
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("id").cast("string")),
      org.apache.spark.sql.functions.col("hm").between(0, 9)).collect()
    assert(rows.forall(x => x.getBoolean(0) && x.getBoolean(1)))
  }

  test("macro-expand: body runs once per entity, legs union by name") {
    // d1 sees the full table, d2 only bob's rows: per-entity resolution
    val resolver: String => DataFrame = {
      case "d1::t" => t
      case "d2::t" => t.filter(col("user") === "bob")
      case "t" => t
      case other => fail(s"unexpected table ref '$other'")
    }
    val inline = KqlParser.parse(
      """macro-expand entity_group [database('d1'), database('d2')] as X (
        |  X.t | where etype == 'click' | project id, user)
        || summarize n = count() by user
        || sort by user asc""".stripMargin, resolver)
    // d1 leg: alice x2 + bob x1; d2 leg: bob x1
    assert(inline.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("alice", 2L), ("bob", 2L)))
    val letBound = KqlParser.parse(
      """let eg = entity_group [database('d1'), cluster('c').database('d2')];
        |macro-expand eg as X ( X.t | summarize n = count() )
        || summarize total = sum(n)""".stripMargin, resolver)
    assert(letBound.collect().head.getLong(0) == 5L + 2L)
  }

  test("macro-expand: alias resolves in union operand lists") {
    val resolver: String => DataFrame = {
      case "d1::t" => t.filter(col("etype") === "click")
      case "d1::t2" => t.filter(col("etype") === "view")
      case "d2::t" => t.filter(col("etype") === "purchase")
      case "d2::t2" => t.limit(0)
      case other => fail(s"unexpected table ref '$other'")
    }
    val out = KqlParser.parse(
      """macro-expand entity_group [database('d1'), database('d2')] as X (
        |  union X.t, X.t2 | summarize n = count())
        || summarize total = sum(n)""".stripMargin, resolver)
    // d1 leg: 3 clicks + 1 view; d2 leg: 1 purchase + 0
    assert(out.collect().head.getLong(0) == 5L)
  }

  test("macro-expand: schema drift across entities null-fills by name") {
    val resolver: String => DataFrame = {
      case "d1::t" => t.withColumn("extra", lit(1L))
      case "d2::t" => t
      case other => fail(s"unexpected table ref '$other'")
    }
    val out = KqlParser.parse(
      "macro-expand entity_group [database('d1'), database('d2')] as X ( X.t )",
      resolver)
    assert(out.count() == 10L)
    assert(out.columns.contains("extra"))
    assert(out.filter(col("extra").isNull).count() == 5L)
  }

  test("macro-expand: unbound group and out-of-scope alias fail loudly") {
    val e = intercept[IllegalArgumentException](
      KqlParser.parse("macro-expand nope as X ( X.t )", _ => t))
    assert(e.getMessage.contains("not a bound entity_group"))
    // outside a macro-expand body the alias has no meaning: X.t parses as a
    // table named X followed by trailing tokens — the PARSER must reject it
    // (the resolver returning a table for "X" must not make `.t` silently
    // work). The resolver records what it was asked for so the assertion is
    // on the parse error, not on a resolver-thrown exception.
    val asked = scala.collection.mutable.Buffer[String]()
    val e2 = intercept[IllegalArgumentException](KqlParser.parse(
      "X.t | summarize n = count()",
      { n => asked += n; t }: String => DataFrame))
    assert(e2.getMessage.contains("trailing tokens"), e2.getMessage)
    assert(asked.toSeq == Seq("X")) // resolved as a TABLE named X, never "X.t"
  }

  test("macro-expand: bare alias without .Table is a scoped error, not a table ref") {
    // the typo `X | where` for `X.t | where` must not silently resolve a
    // table named X from the resolver
    val asked = scala.collection.mutable.Buffer[String]()
    val e = intercept[IllegalArgumentException](KqlParser.parse(
      """macro-expand entity_group [database('d1')] as X (
        |  X | where etype == 'click')""".stripMargin,
      { n => asked += n; t }: String => DataFrame))
    assert(e.getMessage.contains("must be used as 'X.Table'"), e.getMessage)
    assert(asked.isEmpty, s"resolver must never be consulted, asked: $asked")
  }

  test("macro-expand: bare alias in a union operand list gets the scoped error") {
    val asked = scala.collection.mutable.Buffer[String]()
    val e = intercept[IllegalArgumentException](KqlParser.parse(
      """macro-expand entity_group [database('d1')] as X (
        |  X.t | union X | summarize n = count())""".stripMargin,
      { n => asked += n; t }: String => DataFrame))
    assert(e.getMessage.contains("must be used as 'X.Table'"), e.getMessage)
    assert(!asked.contains("X"), s"alias resolved as a table: $asked")
  }

  test("macro-expand: duplicated entities run once (and the list is bounded)") {
    val out = KqlParser.parse(
      """macro-expand entity_group [database('d1'), database('d1')] as X (
        |  X.t | summarize n = count())
        || summarize total = sum(n)""".stripMargin,
      { case "d1::t" => t; case other => fail(s"unexpected '$other'") }: String => DataFrame)
    assert(out.collect().head.getLong(0) == t.count()) // one leg, not two
  }

  test("evaluate index_stats + ann_maintain: inspect and heal the stored index from KQL") {
    import graft.functions.Similarity
    import graft.sources.Tables
    val sfDir = TestSpark.sf
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("corpus_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kql_idxadm").toString
    Similarity.writeIndex(corpus.filter(col("corpus_id") < 300), dir,
      "corpus_id", "embedding", 64, nCentroids = 4, iters = 3)
    // an append leaves a second file in the touched lists
    Similarity.appendToIndex(corpus.filter(col("corpus_id") >= 300), dir,
      "corpus_id", "embedding", 64)
    val res = Tables.resolver(spark, sfDir)
    // READ-ONLY inspection: per-list rows/files, the corpus fully covered
    val stats = KqlParser.parse(
      s"""embeddings | take 1
         || evaluate index_stats('$dir')
         || summarize total = sum(rows), lists = count(), maxf = max(files)""".stripMargin,
      res).collect().head
    assert(stats.getLong(0) == corpus.count(), stats.toString)
    assert(stats.getLong(1) >= 1 && stats.getLong(1) <= 4)
    assert(stats.getLong(2) >= 2, "append must have added a file somewhere")
    // MAINTENANCE: compact from KQL returns the post-op stats — one file
    // per list, rows unchanged
    val post = KqlParser.parse(
      s"""embeddings | take 1
         || evaluate ann_maintain('$dir', 'compact')
         || summarize total = sum(rows), maxf = max(files)""".stripMargin,
      res, allowAdmin = true).collect().head
    assert(post.getLong(0) == corpus.count(), post.toString)
    assert(post.getLong(1) == 1, s"compaction must reset files-per-list: $post")
    // split from KQL with NO cid: targets the hottest list (max rows, ties
    // to the smaller cid) — list count grows by one, rows kept exactly
    val hot = Similarity.hottestList(spark, dir)
    val hotRowsBefore = Similarity.indexStats(spark, dir)
      .where(col("__cid") === hot).select("rows").collect().head.getLong(0)
    val nListsBefore = Similarity.indexStats(spark, dir).count()
    val postSplit = KqlParser.parse(
      s"""embeddings | take 1
         || evaluate ann_maintain('$dir', 'split')
         || summarize total = sum(rows), lists = count()""".stripMargin,
      res, allowAdmin = true).collect().head
    assert(postSplit.getLong(0) == corpus.count(), postSplit.toString)
    assert(postSplit.getLong(1) == nListsBefore + 1, postSplit.toString)
    // the split really hit the hottest list: its row count shrank
    val hotRowsAfter = Similarity.indexStats(spark, dir)
      .where(col("__cid") === hot).select("rows").collect()
      .headOption.map(_.getLong(0)).getOrElse(0L)
    assert(hotRowsAfter < hotRowsBefore,
      s"hottest list $hot: $hotRowsBefore -> $hotRowsAfter")
    // full REBUILD from KQL: geometry from the manifest, nCentroids
    // overridden — the drifted-corpus escape hatch in one command
    val postRebuild = KqlParser.parse(
      s"""embeddings | take 1
         || evaluate ann_rebuild(embeddings, vec_id, embedding, '$dir', 8)
         || summarize total = sum(rows), lists = count()""".stripMargin,
      res, allowAdmin = true).collect().head
    assert(postRebuild.getLong(0) == emb.count(), postRebuild.toString)
    assert(postRebuild.getLong(1) <= 8, postRebuild.toString)
    assert(Similarity.readIndexManifest(spark, dir).nCentroids == 8)
    // MERGE from KQL: a disjoint shard built with the destination's OWN
    // frozen models folds in by file moves (the source tree is consumed),
    // and the returned stats show the union
    val (mc, mb) = Similarity.readIndexModels(spark, dir)
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft_kql_idxmrg").toString
    Similarity.writeIndex(
      corpus.select((col("corpus_id") + 10000L).as("corpus_id"),
        col("embedding")), shardDir, "corpus_id", "embedding", 64,
      trainedIvf = Some(mc), trainedPq = Some(mb))
    val postMerge = KqlParser.parse(
      s"""embeddings | take 1
         || evaluate ann_maintain('$dir', 'merge', '$shardDir')
         || summarize total = sum(rows)""".stripMargin,
      res, allowAdmin = true).collect().head
    assert(postMerge.getLong(0) == 2 * emb.count(), postMerge.toString)
    val mfs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!mfs.exists(new org.apache.hadoop.fs.Path(shardDir)),
      "KQL merge must consume the source tree")
    // N-ARY merge from KQL: a comma list inside the string folds all
    // shards under ONE destination marker cycle (mergeIndexAll)
    val naryShards = (1 to 2).map { i =>
      val sd = java.nio.file.Files
        .createTempDirectory(s"graft_kql_idxmrg$i").toString
      Similarity.writeIndex(
        corpus.select((col("corpus_id") + 10000L * (i + 1)).as("corpus_id"),
          col("embedding")), sd, "corpus_id", "embedding", 64,
        trainedIvf = Some(mc), trainedPq = Some(mb))
      sd
    }
    val postNary = KqlParser.parse(
      s"""embeddings | take 1
         || evaluate ann_maintain('$dir', 'merge', '${naryShards.mkString(",")}')
         || summarize total = sum(rows)""".stripMargin,
      res, allowAdmin = true).collect().head
    assert(postNary.getLong(0) == 4 * emb.count(), postNary.toString)
    naryShards.foreach(sd =>
      assert(!mfs.exists(new org.apache.hadoop.fs.Path(sd)),
        s"KQL n-ary merge must consume shard $sd"))
    // bad op name fails loudly
    val e1 = intercept[IllegalArgumentException] {
      KqlParser.parse(
        s"embeddings | take 1 | evaluate ann_maintain('$dir', 'vacuum')", res,
        allowAdmin = true)
    }
    assert(e1.getMessage.contains("unsupported op"), e1.getMessage)
    // the ADMIN GATE: mutating plugins are refused under an ordinary parse
    // (Kusto's control-command/query separation) — read-only index_stats
    // needs no opt-in (proven above)
    val e2 = intercept[IllegalArgumentException] {
      KqlParser.parse(
        s"embeddings | take 1 | evaluate ann_maintain('$dir', 'compact')", res)
    }
    assert(e2.getMessage.contains("allowAdmin"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      KqlParser.parse(
        s"embeddings | take 1 | evaluate ann_rebuild(embeddings, vec_id, " +
          s"embedding, '$dir')", res)
    }
    assert(e3.getMessage.contains("allowAdmin"), e3.getMessage)
  }

  test("evaluate ann_maintain delete: forget ids from KQL, stats drop exactly, deleted never served again") {
    import graft.functions.Similarity
    import graft.sources.Tables
    val sfDir = TestSpark.sf
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("corpus_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kql_idxdel").toString
    Similarity.writeIndex(corpus, dir, "corpus_id", "embedding", 64,
      nCentroids = 4, iters = 3)
    val res = Tables.resolver(spark, sfDir)
    val n = corpus.count()
    // delete the odd ids among the planted targets from KQL text — the
    // ids frame is a let-bound VIEW, the op returns post-delete stats
    val postDel = KqlParser.parse(
      s"""let gone = embeddings | where vec_id < 25 and vec_id % 2 == 1
         |  | project corpus_id = vec_id;
         |embeddings | take 1
         || evaluate ann_maintain('$dir', 'delete', gone)
         || summarize total = sum(rows)""".stripMargin,
      res, allowAdmin = true).collect().head
    assert(postDel.getLong(0) == n - 12, postDel.toString)
    // deleted originals are provably never returned by a subsequent
    // ann_search in the same (plain, non-admin) query
    val served = KqlParser.parse(
      s"""embeddings
         || where vec_id < 25
         || project query_id = vec_id + 1000000,
         |    embedding = series_add(embedding, repeat(0.02, 64))
         || evaluate ann_search(embeddings, vec_id, query_id, embedding,
         |    '$dir', 1)
         || project query_id, vec_id""".stripMargin,
      res).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(served.length == 25)
    for ((q, c) <- served) {
      val orig = q - 1000000L
      if (orig % 2 == 0) assert(c == orig, s"surviving $orig lost for $q")
      else assert(c != orig, s"deleted $orig served for $q")
    }
  }

  test("evaluate maxsim_search('indexDir'): the scalable late-interaction path from KQL equals the exact form") {
    import graft.functions.Similarity
    import graft.sources.Tables
    val sfDir = TestSpark.sf
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpusTok = emb.select(col("vec_id").as("token_id"),
      (col("vec_id") / 4).cast("long").as("corpus_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kql_msidx").toString
    Similarity.writeIndex(corpusTok, dir, "token_id", "embedding", 64,
      nCentroids = 16, iters = 3, ownerCol = "corpus_id")
    val res = Tables.resolver(spark, sfDir)
    def run(idxArg: String) = KqlParser.parse(
      s"""let ct = embeddings | project token_id = vec_id,
         |    corpus_id = tolong(vec_id / 4), embedding;
         |embeddings
         || where vec_id < 40
         || project query_id = tolong(vec_id / 4) + 1000000,
         |    token_id = vec_id,
         |    embedding = series_add(embedding, repeat(0.02, 64))
         || evaluate maxsim_search(ct, corpus_id, query_id, token_id,
         |    embedding, 1$idxArg)
         || project query_id, corpus_id
         || sort by query_id asc""".stripMargin,
      res).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaIndex = run(s", '$dir', 4")
    assert(viaIndex == run(""),
      "indexed maxsim_search must equal the exact form on the planted fixture")
    assert(viaIndex.size == 10 &&
      viaIndex.forall { case (q, c) => c == q - 1000000L }, viaIndex.toString)
    // an owner-carrying token index rebuilt from KQL must re-supply its
    // ownership column (rebuildIndex refuses silent loss) — the trailing
    // ownerCol identifier argument is the route; the rebuilt tree keeps
    // the owner column and the indexed route still serves
    val eNoOwner = intercept[IllegalArgumentException] {
      KqlParser.parse(
        s"""embeddings | take 1
           || evaluate ann_rebuild(ct_tbl, token_id, embedding, '$dir', 16)"""
          .stripMargin,
        { case "embeddings" => Tables.load(spark, sfDir, "embeddings")
          case "ct_tbl" => corpusTok }: String => DataFrame,
        allowAdmin = true)
    }
    assert(eNoOwner.getMessage.contains("owner"), eNoOwner.getMessage)
    KqlParser.parse(
      s"""embeddings | take 1
         || evaluate ann_rebuild(ct_tbl, token_id, embedding, '$dir', 16,
         |    corpus_id)""".stripMargin,
      { case "embeddings" => Tables.load(spark, sfDir, "embeddings")
        case "ct_tbl" => corpusTok }: String => DataFrame,
      allowAdmin = true).collect()
    assert(spark.read.parquet(s"$dir/lists")
      .schema.fieldNames.contains("owner"),
      "KQL rebuild with ownerCol must keep the owner column")
    assert(run(s", '$dir', 4") == viaIndex,
      "the rebuilt owner index must serve the same planted verdicts")
  }
}
