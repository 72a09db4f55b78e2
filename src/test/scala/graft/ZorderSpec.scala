package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order clustered writes: per-FILE min/max (what parquet footer pruning
  * sees) must stay tight on BOTH interleaved columns, where a plain
  * single-column sort leaves the second column's spans at ~full domain. */
class ZorderSpec extends SparkSpec {

  private def spans(p: String, c: String): Double = {
    val d = spark.read.parquet(p)
    val dom = d.agg((max(col(c)) - min(col(c))).cast("double")).head.getDouble(0)
    d.groupBy(input_file_name())
      .agg(((max(col(c)) - min(col(c))).cast("double") / dom).as("s"))
      .agg(avg(col("s"))).head.getDouble(0)
  }

  test("z-order write keeps file min/max tight on BOTH columns") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val zpath = "/tmp/graft_zorder/z"
    val npath = "/tmp/graft_zorder/n"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_zorder"), true)

    Tables.zorderWrite(li, zpath, "l_orderkey", "l_partkey",
      bits = 12, partitions = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(npath)

    val zo = spans(zpath, "l_orderkey"); val zp = spans(zpath, "l_partkey")
    val no = spans(npath, "l_orderkey"); val np = spans(npath, "l_partkey")
    // z-order: both columns prune; naive sort: only the sort column does
    assert(zo < 0.6 && zp < 0.6, f"zorder spans not tight: $zo%.2f / $zp%.2f")
    assert(np > 0.8, f"naive partkey span unexpectedly tight: $np%.2f")
    assert(no < 0.2, f"naive orderkey span: $no%.2f")
    // row count integrity
    assert(spark.read.parquet(zpath).count() == li.count())
  }

  test("z-order write of an empty input does not NPE") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).where(col("l_orderkey") < 0)
    Tables.zorderWrite(li, "/tmp/graft_zorder/empty", "l_orderkey", "l_partkey")
    assert(spark.read.parquet("/tmp/graft_zorder/empty").count() == 0)
  }
}
