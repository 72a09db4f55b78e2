package graft.kql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KQL-shaped tabular operators over Spark DataFrames.
  *
  * The reference (meerkatdb/meerkat) declares KQL as its query surface
  * (`/root/reference/README.md:33-34`) over a Kusto-typed columnar data model
  * (`/root/reference/src/store/segment_metadata.rs:131-142`). No operator code exists in
  * the reference; semantics here follow public KQL documentation, re-expressed as thin,
  * Catalyst-friendly combinators: every operator builds a declarative logical plan
  * (select / filter / groupBy / join / window) so predicate pushdown, column pruning,
  * partial aggregation and join-strategy selection all come from Catalyst + AQE.
  *
  * Scale posture: no operator here ever collects to the driver, adds an unnecessary
  * shuffle, or materializes intermediate state; `lookup` broadcasts the dimension side
  * explicitly so the 100 TB fact side never shuffles for dimension joins.
  */
object Kql {

  implicit class KqlOps(val df: DataFrame) extends AnyVal {

    /** `T | where pred` */
    def where_(pred: Column): DataFrame = df.filter(pred)

    /** `T | project c1, c2, ...` — select exactly these columns (aliasing allowed). */
    def project(cols: Column*): DataFrame = df.select(cols: _*)

    /** `T | project-away c1, ...` — drop columns, keep the rest in order. */
    def projectAway(cols: String*): DataFrame = df.drop(cols: _*)

    /** `T | project-keep c1, ...` — keep only named columns (original order). */
    def projectKeep(cols: String*): DataFrame = {
      val keep = cols.toSet
      df.select(df.columns.filter(keep).toIndexedSeq.map(col): _*)
    }

    /** `T | project-rename new = old` */
    def projectRename(renames: (String, String)*): DataFrame =
      renames.foldLeft(df) { case (d, (newName, oldName)) => d.withColumnRenamed(oldName, newName) }

    /** `T | extend c = expr` — add/replace computed columns. */
    def extend(cols: (String, Column)*): DataFrame =
      df.withColumns(cols.toMap)

    /** `T | summarize aggs by keys` — hash aggregation; Catalyst plans partial
      * (map-side) + final aggregation automatically, so at 100 TB each executor
      * pre-aggregates before the single shuffle on the group keys. */
    def summarize(by: Seq[Column], aggs: Column*): DataFrame =
      if (by.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(by: _*).agg(aggs.head, aggs.tail: _*)

    /** `T | distinct c1, c2` */
    def distinctOf(cols: Column*): DataFrame = df.select(cols: _*).distinct()

    /** `T | take n` */
    def take_(n: Int): DataFrame = df.limit(n)

    /** `T | top n by expr` — planned by Spark as TakeOrderedAndProject: each partition
      * keeps only its local top-n, then the driver merges n*partitions rows — no global
      * sort, no full shuffle. This is the 100 TB-safe form of "sort | take". */
    def top(n: Int, by: Column*): DataFrame = df.orderBy(by: _*).limit(n)

    /** `T | sort by ...` (KQL `order by`). Range-partitioned total sort. */
    def sortBy(cols: Column*): DataFrame = df.orderBy(cols: _*)

    /** `T | sample n` — Bernoulli sample, deterministic under a fixed seed. */
    def sample_(fraction: Double, seed: Long = 42L): DataFrame = df.sample(fraction, seed)

    /** `T | union U` — KQL union aligns columns by NAME and null-fills missing ones
      * (effective-schema merge semantics, `/root/reference/README.md:14`). */
    def unionKql(other: DataFrame): DataFrame =
      df.unionByName(other, allowMissingColumns = true)

    // ------------------------------------------------------------------
    // Joins: the nine KQL join kinds + lookup.
    // ------------------------------------------------------------------

    /** `T | join kind=... U on keys`.
      *
      * KQL kinds → Spark join types. `innerunique` (the KQL default) deduplicates the
      * LEFT side on the join keys before an inner join; rows kept are decided by
      * `tieBreak` ordering so results are deterministic (KQL itself keeps an arbitrary
      * row). rightsemi/rightanti are expressed by swapping sides.
      */
    def joinKql(other: DataFrame, keys: Seq[String], kind: String,
                tieBreak: Seq[Column] = Nil): DataFrame = kind match {
      case "inner"       => df.join(other, keys, "inner")
      case "leftouter"   => df.join(other, keys, "left_outer")
      case "rightouter"  => df.join(other, keys, "right_outer")
      case "fullouter"   => df.join(other, keys, "full_outer")
      case "leftsemi"    => df.join(other, keys, "left_semi")
      case "leftanti"    => df.join(other, keys, "left_anti")
      case "rightsemi"   => other.join(df, keys, "left_semi")
      case "rightanti"   => other.join(df, keys, "left_anti")
      case "innerunique" =>
        val deduped =
          if (tieBreak.isEmpty) df.dropDuplicates(keys)
          else {
            val w = Window.partitionBy(keys.map(df(_)): _*).orderBy(tieBreak: _*)
            df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
          }
        deduped.join(other, keys, "inner")
      case other_ => throw new IllegalArgumentException(s"unknown join kind: $other_")
    }

    /** `T | lookup D on key` — dimension enrichment. The dimension side is broadcast
      * explicitly: at 100 TB the fact table must never shuffle for a lookup. */
    def lookup(dim: DataFrame, keys: Seq[String]): DataFrame =
      df.join(broadcast(dim), keys, "left_outer")

    /** As-of enrichment: for each left row, the latest `valueCol` from rows matching
      * `matchPred` strictly before it within the same `partitionKeys` group, ordered by
      * `orderCol` (+ tie-break). Implemented as a running window — one shuffle on the
      * partition keys, no join, state O(1) per row: the form that survives 100 TB. */
    def asOfPrior(partitionKeys: Seq[Column], orderCols: Seq[Column],
                  matchPred: Column, valueCol: Column, as: String): DataFrame = {
      val w = Window.partitionBy(partitionKeys: _*).orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn(as, max(when(matchPred, valueCol)).over(w))
    }

    /** As-of JOIN between two tables: for each left row, attach `valueCol` from the
      * right row with the greatest `rightTs` ≤ the left row's `leftTs` within the same
      * `keys` group (inclusive match).
      *
      * NOT a range join (which Spark plans as a broadcast-nested-loop or a
      * partition-exploding band join): both sides are tagged and unioned, then ONE
      * ordered window pass per key group carries the latest right value forward —
      * one shuffle on the keys, O(1) state per row, no pair blow-up. Right rows with
      * duplicate (key, ts) must be pre-aggregated by the caller for determinism. */
    def asOfJoin(right: DataFrame, keys: Seq[String], leftTs: String, rightTs: String,
                 valueCol: String, as: String): DataFrame = {
      val leftCols = df.columns
      val l = df.withColumn("__t", col(leftTs)).withColumn("__side", lit(1))
        .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
      val r = right.select((keys.map(col) :+ col(rightTs).as("__t") :+
        col(valueCol).as("__v")): _*).withColumn("__side", lit(0))
      // right rows sort before left rows at equal ts ⇒ inclusive (ts_r <= ts_l) match
      val merged = l.unionByName(r, allowMissingColumns = true)
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      merged
        .withColumn(as, last(when(col("__side") === 0, col("__v")), ignoreNulls = true).over(w))
        .filter(col("__side") === 1)
        .select(leftCols.map(col) :+ col(as): _*)
    }

    /** `T | top-nested n1 of k1 by agg1, top-nested n2 of k2 by agg2` (2 levels):
      * per outer key keep top `n` inner keys by `rank`. */
    def topNested(outer: Column, inner: Column, rank: Column, n: Int,
                  tieBreak: Column): DataFrame = {
      val agged = df.groupBy(outer.as("__outer"), inner.as("__inner"))
        .agg(rank.as("__rank"))
      val w = Window.partitionBy(col("__outer")).orderBy(col("__rank").desc, tieBreak)
      agged.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n).drop("__rn")
    }

    /** `mv-expand c` — explode an array column into one row per element. */
    def mvExpand(arrayCol: Column, as: String): DataFrame =
      df.withColumn(as, explode(arrayCol))

    /** `mv-expand with_itemindex=pos c` — explode with the element's position, the
      * building block for `mv-apply` (per-element subquery, then regroup on the
      * carried row identity + position order). */
    def mvExpandPos(arrayCol: Column, posName: String, as: String): DataFrame =
      df.select(col("*"), posexplode(arrayCol).as(Seq(posName, as)))

    /** `bag_unpack(d)` — star-expand a dynamic (JSON) bag column into top-level
      * columns. The schema is inferred from the data itself (meerkat's schemaless
      * ingest: "data types will be inferred at ingestion time",
      * `/root/reference/README.md:20`); `samplingRatio` bounds the inference pass at
      * scale (inference reads the JSON column only — full column pruning). */
    def bagUnpack(jsonCol: String, samplingRatio: Double = 1.0): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val schema = spark.read.option("samplingRatio", samplingRatio.toString)
        .json(df.select(col(jsonCol)).as[String]).schema
      df.withColumn("__bag", from_json(col(jsonCol), schema))
        .select(col("*"), col("__bag.*")).drop("__bag", jsonCol)
    }

    /** `make-series agg default=fill on tsCol step Δ by keys` — regular time grid per
      * key group with zero/const fill. Grid bounds are computed distributively
      * (min/max aggregation, broadcast back), never collected per-row. */
    def makeSeries(keys: Seq[Column], tsCol: Column, stepSeconds: Long,
                   aggs: Seq[Column], fills: Seq[Column]): DataFrame = {
      val binned = df.withColumn("__bin", Bin.ts(tsCol, stepSeconds))
      val agged = binned.groupBy((keys :+ col("__bin")): _*).agg(aggs.head, aggs.tail: _*)
      // global [min,max] grid — single-row dimension, broadcast-joined to key groups
      val bounds = binned.agg(min(col("__bin")).as("__lo"), max(col("__bin")).as("__hi"))
      val grid = bounds.select(explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("__bin"))
      val keyRows = df.select(keys: _*).distinct()
      val full = keyRows.crossJoin(broadcast(grid))
      val aggNames = agged.columns.drop(keys.size + 1)
      val joined = full.join(agged, full.columns.toSeq, "left_outer")
      aggNames.zip(fills).foldLeft(joined) { case (d, (name, fill)) =>
        d.withColumn(name, coalesce(col(name), fill))
      }
    }

    /** `series_fill_linear` — linearly interpolate null gaps in a regular series
      * (the makeSeries output with null fill): one shuffle on the series keys, two
      * ordered window passes (previous / next non-null anchor), O(1) state per row.
      * Edge bins with no anchor on one side take the nearest anchor (KQL edge
      * behavior for fill_linear). */
    def seriesFillLinear(keys: Seq[Column], binCol: Column, valueCol: String): DataFrame = {
      val w = Window.partitionBy(keys: _*).orderBy(binCol)
      val prevW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nextW = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val v = col(valueCol).cast("double")
      val binSec = binCol.cast("double")
      val prevV = last(v, ignoreNulls = true).over(prevW)
      val prevB = last(when(v.isNotNull, binSec), ignoreNulls = true).over(prevW)
      val nextV = first(v, ignoreNulls = true).over(nextW)
      val nextB = first(when(v.isNotNull, binSec), ignoreNulls = true).over(nextW)
      df.withColumn(valueCol,
        when(v.isNotNull, v)
          .when(prevV.isNull, nextV)
          .when(nextV.isNull, prevV)
          .otherwise(prevV + (nextV - prevV) * (binSec - prevB) / (nextB - prevB)))
    }
  }

  /** `range` operator: generate a stepped sequence as a distributed table. */
  def rangeTable(spark: org.apache.spark.sql.SparkSession, start: Long, stop: Long,
                 step: Long): DataFrame =
    spark.range(start, stop, step).toDF("value")

  /** KQL `bin()` — floor a value/timestamp to a fixed-size bucket. */
  object Bin {
    /** bin(ts, Δseconds): timestamp → bucket start. Arbitrary bucket widths (not just
      * calendar units), matching KQL `bin(ts, 6h)`. */
    def ts(c: Column, seconds: Long): Column =
      timestamp_seconds(floor(unix_timestamp(c) / seconds) * seconds)

    /** bin(x, width) for numeric columns. */
    def num(c: Column, width: Double): Column = floor(c / width) * width
  }
}
