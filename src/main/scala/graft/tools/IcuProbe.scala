package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is the first collation-aware string function paying a giant one-time
  * class-init cost (ICU case-map tables)? */
object IcuProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"PROBE $tag ${(System.nanoTime() - t0) / 1e9}s")
    }
    time("baseline-count")(spark.range(10).count())
    time("first-lower")(spark.range(10).select(lower(lit("AbC"))).count())
    time("second-lower")(spark.range(10).select(lower(lit("XyZ"))).count())
    time("first-upper")(spark.range(10).select(upper(lit("abc"))).count())
    time("first-md5")(spark.range(10).select(md5(lit("abc"))).count())
    time("first-regexp")(spark.range(10).select(regexp_replace(lit("a b"), "\\s+", " ")).count())
    time("first-split")(spark.range(10).select(split(lit("a b"), " ")).count())
    spark.stop()
  }
}
