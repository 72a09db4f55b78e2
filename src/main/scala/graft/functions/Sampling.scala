package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`TABLESAMPLE`, `rand()`) is the wrong tool for corpus
  * curation at 100 TB: runs aren't reproducible, and re-executing a stage
  * after a failure re-draws the sample. Hash-ranked sampling fixes both —
  * the "random" order is md5(id), portable across engines and stable across
  * retries, re-partitions, and cluster sizes.
  */
object Sampling {

  /** Stratified sample: the `k` hash-first rows per stratum. One shuffle on
    * the stratum key; rank ties broken by id so the cut is total-ordered.
    * For strata far larger than k, Spark's WindowGroupLimit pushes the
    * rank<=k cut into the partial (map) side before the shuffle. */
  def stratified(df: DataFrame, stratum: Column, id: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(id.cast("string")), id)
    df.withColumn("_rk", row_number().over(w)).where(col("_rk") <= k).drop("_rk")
  }

  /** Proportional (rate-based) sample: keep a deterministic `pct`% of rows —
    * the first two md5 hex digits of the id map uniformly onto 0..255, so
    * `pct` percent means hash byte < pct*256/100 (integer threshold). Pure
    * scan-side filter: no shuffle, no state, works mid-stream. */
  def byRate(df: DataFrame, id: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "byRate: pct in [0,100]")
    df.where(conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
      .cast("int") < pct * 256 / 100)
  }
}
