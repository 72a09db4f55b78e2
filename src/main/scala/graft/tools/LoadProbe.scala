package graft.tools
import org.apache.spark.sql.SparkSession
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // warm FS cache
    graft.sources.Tables.load(spark, d, "events").schema
    for (t <- Seq("events", "documents", "lineitem", "embeddings")) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { graft.sources.Tables.load(spark, d, t).schema; i += 1 }
      println(f"$t%-12s load+schema x20 = ${(System.nanoTime()-t0)/1e6}%.0f ms (${(System.nanoTime()-t0)/20e6}%.1f ms/call)")
    }
    spark.stop()
  }
}
