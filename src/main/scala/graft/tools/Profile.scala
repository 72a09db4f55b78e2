package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time named contract queries (comma-separated) against an SF dir.
  * Uses the noop sink (same methodology as Bench); pass -explain to dump plans. */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1 && !args(1).startsWith("-")) args(1) else "/root/testdata/sf0.001"
    val explain = args.contains("-explain")
    val runs = args.collectFirst { case a if a.startsWith("-n") => a.drop(2).toInt }.getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000") // see Bench.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Warmup.run(spark)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (explain) df.explain("formatted")
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$name] run$i t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
