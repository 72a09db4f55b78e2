package graft

import org.apache.spark.sql.functions._
import graft.kql.Kql._
import graft.sources.Tables

class KqlOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val left = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "lv")
  lazy val right = Seq((1, "x"), (2, "y"), (2, "z"), (4, "w")).toDF("k", "rv")

  test("join kinds produce KQL row counts") {
    assert(left.joinKql(right, Seq("k"), "inner").count() == 4) // (1a,1b)x(1x)+ (2c)x(2y,2z)
    assert(left.joinKql(right, Seq("k"), "leftouter").count() == 5)
    assert(left.joinKql(right, Seq("k"), "rightouter").count() == 5)
    assert(left.joinKql(right, Seq("k"), "fullouter").count() == 6)
    assert(left.joinKql(right, Seq("k"), "leftsemi").count() == 3)
    assert(left.joinKql(right, Seq("k"), "leftanti").count() == 1)
    assert(left.joinKql(right, Seq("k"), "rightsemi").count() == 3)
    assert(left.joinKql(right, Seq("k"), "rightanti").count() == 1)
  }

  test("innerunique dedupes left side deterministically") {
    val res = left.joinKql(right, Seq("k"), "innerunique", tieBreak = Seq(col("lv")))
      .orderBy("k", "rv").collect()
    // k=1 keeps lv=a; k=2 keeps lv=c with two right matches
    assert(res.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "a", "x"), (2, "c", "y"), (2, "c", "z")))
  }

  test("unionKql aligns by name and null-fills") {
    val a = Seq((1, "t")).toDF("id", "s")
    val b = Seq((2, 3.5)).toDF("id", "v")
    val u = a.unionKql(b).orderBy("id").collect()
    assert(u.length == 2)
    assert(u(0).getString(1) == "t" && u(0).isNullAt(2))
    assert(u(1).isNullAt(1) && u(1).getDouble(2) == 3.5)
  }

  test("project family") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    assert(df.projectAway("b").columns.toSeq == Seq("a", "c"))
    assert(df.projectKeep("c", "a").columns.toSeq == Seq("a", "c"))
    assert(df.projectRename("z" -> "a").columns.contains("z"))
    assert(df.extend("d" -> (col("a") + col("b"))).select("d").head().getInt(0) == 3)
  }

  test("top is planned as TakeOrderedAndProject (no global sort at scale)") {
    val li = Tables.load(spark, sf, "lineitem")
    val plan = li.top(10, col("l_extendedprice").desc).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("bin() buckets timestamps to fixed widths") {
    val e = Tables.load(spark, sf, "events")
      .extend("b" -> Bin.ts(col("ts"), 21600))
    val mins = e.select(minute(col("b"))).distinct().as[Int].collect().toSet
    assert(mins == Set(0))
    val hours = e.select(hour(col("b"))).distinct().as[Int].collect().toSet
    assert(hours.subsetOf(Set(0, 6, 12, 18)))
  }

  test("makeSeries fills gaps with the fill value") {
    val df = Seq(
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1.0),
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 03:20:00"), 2.0),
      ("k2", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 5.0)
    ).toDF("k", "ts", "v")
    val series = df.makeSeries(Seq(col("k")), col("ts"), 3600,
      Seq(count(lit(1)).as("n"), sum(col("v")).as("s")), Seq(lit(0L), lit(0.0)))
    // grid 00:00..03:00 = 4 buckets × 2 keys = 8 rows
    assert(series.count() == 8)
    val zeroes = series.filter(col("n") === 0).count()
    assert(zeroes == 5)
  }

  test("topNested keeps top-n per outer key") {
    val li = Tables.load(spark, sf, "lineitem")
      .projectRename("p_partkey" -> "l_partkey")
      .joinKql(Tables.load(spark, sf, "part"), Seq("p_partkey"), "inner")
    val tn = li.topNested(col("p_brand"), col("p_partkey"),
      sum(col("l_quantity")).as("q"), 3, col("__inner"))
    val maxPerBrand = tn.groupBy("__outer").count().agg(max("count")).head().getLong(0)
    assert(maxPerBrand <= 3)
  }

  test("rangeTable generates stepped values") {
    val r = rangeTable(spark, 0, 10, 3).as[Long].collect().sorted
    assert(r.toSeq == Seq(0L, 3L, 6L, 9L))
  }

  test("serializedRowFns matches the single-partition window across partitionings") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, sf, "events").where_(col("user_id") < 8)
      .project(col("user_id"), col("ts"), col("event_id"))
    val order = Seq(col("user_id").asc, col("ts").asc, col("event_id").asc)
    // ground truth: the naive global window (correct, single-task)
    val w = Window.orderBy(order: _*)
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newTs = when(col("ts").cast("long") -
      lag(col("ts").cast("long"), 1).over(w) > 900 || lag(col("ts"), 1).over(w).isNull,
      col("ts"))
    val expected = e
      .withColumn("rn", row_number().over(w))
      .withColumn("pe", lag(col("event_id"), 1).over(w))
      .withColumn("ne", lead(col("event_id"), 1).over(w))
      .withColumn("pe7", lag(col("event_id"), 7, -1L).over(w))
      .withColumn("ne5", lead(col("event_id"), 5).over(w))
      .withColumn("cs", sum(col("event_id")).over(wc))
      .withColumn("__seg", sum(when(col("event_id") % 5 === 0, 1L).otherwise(0L)).over(wc))
      .withColumn("csr", sum(col("event_id")).over(
        Window.partitionBy(col("__seg")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__seg")
      .withColumn("rk", dense_rank().over(Window.orderBy(col("user_id"))))
      .withColumn("rkm", rank().over(Window.orderBy(col("user_id"))))
      .withColumn("sess", last(newTs, ignoreNulls = true).over(wc))
      .orderBy(order: _*).collect().toSeq
    for (parts <- Seq(1, 3, 17)) {
      val fns = Seq[RowFn](RowNumber("rn"), PrevOf("pe", col("event_id")),
        NextOf("ne", col("event_id")),
        PrevOf("pe7", col("event_id"), 7, Some(lit(-1L))),
        NextOf("ne5", col("event_id"), 5),
        CumSumOf("cs", col("event_id")),
        CumSumOf("csr", col("event_id"), Some(col("event_id") % 5 === 0)),
        RankDense("rk", col("user_id")), RankMin("rkm", col("user_id")),
        WindowSession("sess", col("ts"), 900))
      val got = serializedRowFns(e.repartition(parts), order, fns)
        .select(e.columns.map(col).toIndexedSeq ++ Seq(col("rn"), col("pe"), col("ne"),
          col("pe7"), col("ne5"), col("cs"), col("csr"), col("rk").cast("int"),
          col("rkm").cast("int"), col("sess")): _*)
        .orderBy(order: _*).collect().toSeq
      assert(got == expected, s"parts=$parts mismatch")
    }
  }

  test("row_cumsum with restart matches the segment-window reference across partitionings") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, sf, "events").where_(col("user_id") < 8)
      .project(col("user_id"), col("ts"), col("event_id"))
    val order = Seq(col("user_id").asc, col("ts").asc, col("event_id").asc)
    val restart = col("event_id") % 5 === 0
    // reference: segment id = running count of restarts, then cumsum per segment
    val w = Window.orderBy(order: _*)
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = e
      .withColumn("__seg", sum(when(restart, 1L).otherwise(0L)).over(wc))
      .withColumn("cs", sum(col("event_id")).over(
        Window.partitionBy(col("__seg")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__seg")
      .orderBy(order: _*).collect().toSeq
    for (parts <- Seq(1, 3, 17)) {
      val got = serializedRowFns(e.repartition(parts), order,
          Seq[RowFn](CumSumOf("cs", col("event_id"), Some(restart))))
        .select(e.columns.map(col).toIndexedSeq :+ col("cs"): _*)
        .orderBy(order: _*).collect().toSeq
      assert(got == expected, s"parts=$parts mismatch")
    }
  }

  test("q_kql_rank_session fixture: no idle session spans 1d, so maxDuration is inert") {
    // q_kql_rank_session calls row_window_session(ts, 1d, 30m) and its DuckDB
    // oracle models ONLY the idle-gap logic. That is sound iff no 30m-dense run
    // in the fixture lasts longer than 1d — proven here against the driver's
    // correctness fixture (sf0.01; falls back to the local test sf if absent).
    import org.apache.spark.sql.expressions.Window
    val dir =
      if (new java.io.File("/root/testdata/sf0.01/events.parquet").exists())
        "/root/testdata/sf0.01"
      else sf
    val e = Tables.load(spark, dir, "events").where(col("user_id") < 5)
    val w = Window.orderBy(col("user_id"), col("ts"), col("event_id"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newTs = when(lag(col("ts"), 1).over(w).isNull ||
      col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(w) > 1800, col("ts"))
    val maxSpanSec = e
      .withColumn("sess", last(newTs, ignoreNulls = true).over(wc))
      .select(max(col("ts").cast("long") - col("sess").cast("long")))
      .as[Long].head()
    assert(maxSpanSec < 86400, s"an idle session spans ${maxSpanSec}s >= 1d: " +
      "the q_kql_rank_session oracle no longer models the engine")
  }
}
