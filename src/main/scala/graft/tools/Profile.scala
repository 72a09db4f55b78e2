package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time one named contract query and print its physical plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"RUN$i rows=$n t=${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
