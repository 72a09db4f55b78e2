package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed-layout contracts: equi-joins and aggregations on the bucket key
  * must plan WITHOUT any exchange — the co-located layout that removes the
  * dominant shuffle for repeated fact⋈dim joins at scale. */
class BucketingSpec extends SparkSpec {

  /** Drop any previous incarnation (table AND location — the /tmp warehouse
    * outlives the metastore across forked JVMs) before writing. */
  private def rewriteBucketed(df: org.apache.spark.sql.DataFrame, table: String,
                              key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft_test_warehouse/$table"), true)
    Tables.writeBucketed(df, table, key, buckets)
  }

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("join of two tables bucketed on the key runs with zero exchanges") {
    val e = Tables.load(spark, sf, "events")
    rewriteBucketed(e.select("user_id", "event_id", "value"), "b_events", "user_id", 8)
    rewriteBucketed(
      e.groupBy("user_id").agg(count(lit(1)).as("n_total")), "b_users", "user_id", 8)
    withNoBroadcast {
      val joined = spark.table("b_events").join(spark.table("b_users"), "user_id")
      val n = joined.count()
      assert(n == e.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected an exchange-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    }
  }

  test("aggregation on the bucket key runs with zero exchanges") {
    if (!spark.catalog.tableExists("b_events"))
      rewriteBucketed(Tables.load(spark, sf, "events")
        .select("user_id", "event_id", "value"), "b_events", "user_id", 8)
    val agged = spark.table("b_events").groupBy("user_id")
      .agg(sum(col("value")).as("sv"))
    val rows = agged.count()
    assert(rows > 0)
    val plan = agged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free bucketed agg:\n$plan")
  }
}
