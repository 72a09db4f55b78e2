package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev harness: measure the SpaceSaving eviction path under the adversarial
  * ALL-DISTINCT stream — once the counter table is full, EVERY row misses and
  * pays the O(capacity) `minBy` scan (FrequentItems.SpaceSavingAgg.reduce),
  * the one theoretical hot-path scan the plan audits keep flagging. Compares
  * against the skewed stream (mostly hits, evictions rare) at several
  * capacities, on the same row count. Usage:
  *   runMain graft.tools.SketchProfile <sfDir> [capacities]
  */
object SketchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val caps = (if (args.length > 1) args(1) else "256,1024,4096")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Warmup.run(spark)

    val ev = graft.sources.Tables.load(spark, sfDir, "events").cache()
    val n = ev.count()
    // all-distinct: event_id (unique) — every post-fill row evicts.
    // skewed: user_id % 97 — ~97 hot keys, evictions only during warm-fill.
    val streams = Seq(
      "all-distinct" -> ev.select(F.col("event_id").cast("string").as("v")),
      "skewed-97" -> ev.select((F.col("event_id") % 97).cast("string").as("v")))
    println(s"[sketch] rows=$n")
    for ((label, df) <- streams; cap <- caps) {
      import spark.implicits._
      val agg = new graft.functions.FrequentItems.SpaceSavingAgg(cap)
      val plan = df.as[String].select(agg.toColumn.name("m"))
        .select(F.size(F.map_keys(F.col("m"))).as("k"))
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val k = plan.head().getInt(0)
        println(f"[sketch] $label cap=$cap run$i keys=$k t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
