package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every driver-contract query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line on stdout.
  *
  * Methodology: results go to the noop sink (`format("noop")`), which executes the
  * full plan — every projection is materialized, unlike `.count()` which lets
  * Catalyst prune unreferenced expressions. Each query is executed twice and the
  * MINIMUM wall time reported (disclosed as "timing":"min_of_2"): this VM sees
  * noisy-neighbor CPU steal that can inflate a single run of a CPU-bound query by
  * 10-40×, and min-of-2 measures the engine, not the neighbor. Failures are
  * recorded per-query in an `errors` map instead of being swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Warmup.run(spark)
    var times = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // fresh DataFrame per run: no AQE stage reuse between the two timings
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        times :+= name -> t
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","timing":"min_of_2","queries":$qs,"errors":$es,"n_failed":${errors.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
