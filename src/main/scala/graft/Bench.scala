package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every driver-contract query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line on stdout.
  *
  * Methodology: results go to the noop sink (`format("noop")`), which executes the
  * full plan — every projection is materialized, unlike `.count()` which lets
  * Catalyst prune unreferenced expressions. Failures are recorded per-query in an
  * `errors` map (and the timing excluded from totals) instead of being swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Warmup.run(spark)
    var times = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times :+= name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        errors :+= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.map(_._2).sum
    // single line, stdout only — the driver parses this
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_failed":${errors.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
