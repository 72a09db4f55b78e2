package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(7500).selectExpr("id % 5 as g", "id as u")
    df.write.format("noop").mode("overwrite").save()
    for (rsd <- Seq(0.05, 0.02, 0.016, 0.01); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      df.groupBy("g").agg(approx_count_distinct(col("u"), rsd)).write.format("noop").mode("overwrite").save()
      if (rep == 3) println(f"rsd=$rsd rep$rep ${(System.nanoTime()-t0)/1e9}%.3fs")
    }
    // exactness check at the hll_if fixture shape (64 distinct values)
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "events")
    ev.groupBy("event_type").agg(
        approx_count_distinct(expr("CASE WHEN event_id % 2 = 0 THEN user_id % 64 END"), 0.02).as("hi02"),
        countDistinct(expr("CASE WHEN event_id % 2 = 0 THEN user_id % 64 END")).as("exact"))
      .show(10, false)
    spark.stop()
  }
}
