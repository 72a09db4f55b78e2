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

    /** KQL `join ... on $left.a == $right.b` — equi-join on differently-named
      * keys. Still a key-equality condition, so Catalyst plans the same
      * hash/sort-merge/broadcast physicals as the name-based form. For kinds
      * that output both sides, colliding right column names get a `1` suffix
      * (Kusto's duplicate-name rule); semi/anti kinds output one side and
      * need no renaming. */
    def joinKqlOn(other: DataFrame, pairs: Seq[(String, String)],
                  kind: String): DataFrame = {
      def cond(r: DataFrame, rename: String => String) =
        pairs.map { case (l, r0) => df(l) === r(rename(r0)) }.reduce(_ && _)
      val collisions = other.columns.filter(df.columns.contains).toSet
      def renamed = collisions.foldLeft(other)((d, c) => d.withColumnRenamed(c, c + "1"))
      def rn(c: String) = if (collisions.contains(c)) c + "1" else c
      kind match {
        case "inner"      => df.join(renamed, cond(renamed, rn), "inner")
        case "leftouter"  => df.join(renamed, cond(renamed, rn), "left_outer")
        case "rightouter" => df.join(renamed, cond(renamed, rn), "right_outer")
        case "fullouter"  => df.join(renamed, cond(renamed, rn), "full_outer")
        case "leftsemi"   => df.join(other, cond(other, identity), "left_semi")
        case "leftanti"   => df.join(other, cond(other, identity), "left_anti")
        case "rightsemi"  => other.join(df, cond(other, identity), "left_semi")
        case "rightanti"  => other.join(df, cond(other, identity), "left_anti")
        case "innerunique" =>
          df.dropDuplicates(pairs.map(_._1)).join(renamed, cond(renamed, rn), "inner")
        case other_ => throw new IllegalArgumentException(s"unknown join kind: $other_")
      }
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
        .select(leftCols.toIndexedSeq.map(col) :+ col(as): _*)
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

    /** General N-level `top-nested`: level i keeps, per surviving key prefix
      * (k1..k(i-1)), the top `n_i` values of `k_i` ranked by `agg_i` (desc, key
      * tie-break). Output: one row per surviving leaf combination carrying every
      * level's key and aggregate, like KQL.
      *
      * Scale: each level aggregates the (semi-join-pruned) fact table by its key
      * prefix — partial+final hash agg, one shuffle on the prefix — then ranks the
      * already-aggregated (small) key table. Level 1's global top-n is a
      * TakeOrdered over aggregated keys, not a sort of the data; deeper levels
      * use a window partitioned by the prefix. Selected-prefix sets are top-n
      * bounded (≤ Π n_i rows) and broadcast. */
    def topNestedMulti(levels: Seq[(Int, String, Column, String, Boolean)],
                       othersLabel: Option[String] = None): DataFrame = {
      require(levels.nonEmpty, "top-nested needs at least one level")
      var selected: DataFrame = null
      val last = levels.size - 1
      levels.zipWithIndex.foreach { case ((n, key, agg, aggName, asc), i) =>
        def rankOrder = if (asc) col(aggName).asc else col(aggName).desc
        val prefix = levels.take(i).map(_._2)
        val base =
          if (selected == null) df
          else df.join(broadcast(selected.select(prefix.map(col): _*).distinct()),
            prefix, "left_semi")
        val grouped = base.groupBy((prefix :+ key).map(col): _*).agg(agg.as(aggName))
        var topped =
          if (i == 0) grouped.orderBy(rankOrder, col(key)).limit(n)
          else {
            val w = Window.partitionBy(prefix.map(col): _*)
              .orderBy(rankOrder, col(key))
            grouped.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") <= n).drop("__rn")
          }
        // `with others = label` (final level): one extra row per surviving
        // prefix aggregating the RAW rows outside the top keys — exact for any
        // aggregate (no re-aggregation of partial results). The anti-join's
        // right side is the top-n-bounded key set, always broadcastable.
        if (i == last && othersLabel.isDefined) {
          val keyCols = (prefix :+ key).map(col)
          val others = base
            .join(broadcast(topped.select(keyCols: _*)), prefix :+ key, "left_anti")
            .groupBy(prefix.map(col): _*).agg(agg.as(aggName))
            .withColumn(key, lit(othersLabel.get))
          topped = topped.withColumn(key, col(key).cast("string"))
            .unionByName(others.select(topped.columns.map(col).toIndexedSeq: _*)
              .withColumn(key, col(key).cast("string")))
        }
        selected =
          if (selected == null) topped
          else topped.join(broadcast(selected), prefix, "inner")
      }
      selected.select(levels.flatMap { case (_, k, _, a, _) => Seq(col(k), col(a)) }: _*)
    }

    /** A dynamic (variant) column holding a JSON array explodes like an array:
      * normalize to `array<variant>` (null for non-array variants, so those
      * rows drop — Kusto mv-expands a non-array dynamic to nothing too). */
    private def expandable(c: Column): Column = expandableTyped(c)._1
    /** One analysis pass: the expandable form plus its RESULT type (so
      * multi-column zip padding doesn't re-analyze per operand). */
    private def expandableTyped(c: Column): (Column, Option[org.apache.spark.sql.types.DataType]) = {
      val dt = try Some(df.select(c).schema.head.dataType)
               catch { case scala.util.control.NonFatal(_) => None }
      if (dt.exists(_.typeName == "variant"))
        (c.try_cast("array<variant>"), Some(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.VariantType)))
      else (c, dt)
    }

    /** `mv-expand c` — explode an array column into one row per element.
      * A BAG (map) column expands to one row per property carried as
      * `<name>_key` / `<name>_value` columns (Kusto emits single-entry bags;
      * the flat pair is the relational equivalent, documented deviation).
      * A dynamic (variant) JSON array explodes to variant elements. */
    def mvExpand(arrayCol: Column, as: String): DataFrame = {
      val isMap =
        try df.select(arrayCol).schema.head.dataType
          .isInstanceOf[org.apache.spark.sql.types.MapType]
        catch { case _: Throwable => false }
      if (isMap)
        df.select(col("*"), explode(arrayCol).as(Seq(s"${as}_key", s"${as}_value")))
          .drop(as)
      else df.withColumn(as, explode(expandable(arrayCol)))
    }

    /** `mv-expand c1, c2, ...` — PARALLEL multi-column expansion: the arrays
      * zip element-wise to the longest length with null padding (Kusto's
      * multi-column contract), then ONE explode of the zipped struct array.
      * Expanded names replace existing columns. */
    def mvExpandZip(items: Seq[(String, Column)],
        itemIdx: Option[String]): DataFrame = {
      // arrays_zip returns NULL (dropping the whole row) if ANY operand is
      // null; Kusto pads a null operand with nulls against the longest
      // array, so coalesce each operand to a typed empty array first.
      val zipped = arrays_zip(items.map { case (n, e) =>
        val (ex, dt) = expandableTyped(e)
        val padded = dt match {
          case Some(at: org.apache.spark.sql.types.ArrayType) =>
            coalesce(ex, array().cast(at))
          case _ => ex
        }
        padded.as(n)
      }: _*)
      val keep = df.columns.filterNot(c => items.exists(_._1 == c))
        .map(col).toIndexedSeq
      val exploded = itemIdx match {
        case Some(ix) =>
          df.select(keep :+ posexplode(zipped).as(Seq(ix, "__mvz")): _*)
        case None => df.select(keep :+ explode(zipped).as("__mvz"): _*)
      }
      items.foldLeft(exploded) { case (d, (n, _)) =>
        d.withColumn(n, col("__mvz").getField(n))
      }.drop("__mvz")
    }

    /** `mv-expand with_itemindex=idx c` — explode with the element's 0-based
      * position (posexplode; same Generator machinery, still codegen-adjacent).
      * Like mv-expand of a bare column, the expanded name REPLACES an existing
      * column of that name. */
    def mvExpandIndexed(arrayCol: Column, as: String, idx: String): DataFrame = {
      val keep = df.columns.filterNot(_ == as).map(col).toIndexedSeq
      df.select(keep :+ posexplode(expandable(arrayCol)).as(Seq(idx, as)): _*)
    }

    /** `mv-expand with_itemindex=pos c` — explode with the element's position, the
      * building block for `mv-apply` (per-element subquery, then regroup on the
      * carried row identity + position order). */
    def mvExpandPos(arrayCol: Column, posName: String, as: String): DataFrame =
      df.select(col("*"), posexplode(expandable(arrayCol)).as(Seq(posName, as)))

    /** `bag_unpack(d)` — star-expand a dynamic (JSON) bag column into top-level
      * columns. The schema is inferred from the data itself (meerkat's schemaless
      * ingest: "data types will be inferred at ingestion time",
      * `/root/reference/README.md:20`).
      *
      * Scale: the plan-build inference job is BOUNDED — it reads at most
      * `inferLimit` rows of the (pruned) JSON column via a pushed LocalLimit, so
      * at 100 TB it touches one scan split, never the whole table. `samplingRatio`
      * further thins the sampled slice. Keys that first appear beyond the sampled
      * rows are absent from the inferred schema (document-or-raise at ingest, as
      * with any sampled schema inference). */
    def bagUnpack(jsonCol: String, samplingRatio: Double = 1.0,
                  inferLimit: Int = 10000, prefix: String = ""): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val schema = spark.read.option("samplingRatio", samplingRatio.toString)
        .json(df.select(col(jsonCol)).limit(inferLimit).as[String]).schema
      val unpacked = schema.fieldNames.toSeq.map(f =>
        col(s"__bag.`$f`").as(prefix + f))
      df.withColumn("__bag", from_json(col(jsonCol), schema))
        .select(col("*") +: unpacked: _*).drop("__bag", jsonCol)
    }

    /** `evaluate bag_unpack(d) : (a: long, b: string)` — Kusto's OutputSchema
      * clause: the declared schema replaces inference, so there is NO extra
      * corpus scan (the inference path reads up to inferLimit rows first) and
      * the output is deterministic regardless of which bags appear — the
      * form to prefer at 100 TB. */
    def bagUnpackTyped(jsonCol: String, fields: Seq[(String, String)],
        prefix: String = ""): DataFrame = {
      import org.apache.spark.sql.types.StructType
      val ddl = fields.map { case (n, t) => s"`$n` $t" }.mkString(", ")
      val schema = StructType.fromDDL(ddl)
      val unpacked = fields.map { case (n, _) =>
        col(s"__bag.`$n`").as(prefix + n) }
      df.withColumn("__bag", from_json(col(jsonCol), schema))
        .select(col("*") +: unpacked: _*).drop("__bag", jsonCol)
    }

    /** `make-series agg default=fill on tsCol [from f to t] step Δ by keys` —
      * regular time grid per key group with zero/const fill. Without explicit
      * bounds the grid spans the data's [min, max] bins, computed
      * distributively (min/max aggregation, broadcast back), never collected
      * per-row; with `from`/`to` the grid is [bin(f), bin(t − 1µs)] and rows
      * outside [f, t) are excluded first (bins stay epoch-aligned — the
      * engine-wide bin convention; Kusto aligns at `f`, documented
      * deviation). */
    def makeSeries(keys: Seq[Column], tsCol: Column, stepSeconds: Long,
                   aggs: Seq[Column], fills: Seq[Column],
                   fromTo: Option[(Column, Column)] = None): DataFrame = {
      val base = fromTo.map { case (f, t) =>
        df.filter(tsCol >= f && tsCol < t)
      }.getOrElse(df)
      val binned = base.withColumn("__bin", Bin.ts(tsCol, stepSeconds))
      val agged = binned.groupBy((keys :+ col("__bin")): _*).agg(aggs.head, aggs.tail: _*)
      // grid bounds: explicit range (no data scan) or global [min,max]
      val bounds = fromTo match {
        case Some((f, t)) => df.sparkSession.range(1).select(
          Bin.ts(f, stepSeconds).as("__lo"),
          Bin.ts(timestamp_micros(unix_micros(t) - 1), stepSeconds).as("__hi"))
        case None =>
          binned.agg(min(col("__bin")).as("__lo"), max(col("__bin")).as("__hi"))
      }
      val grid = bounds.select(explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("__bin"))
      val keyRows = base.select(keys: _*).distinct()
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

    /** `T | evaluate basket(threshold, c1, ..., ck)` — frequent-attribute-
      * combination mining (KQL basket plugin): every non-empty subset of the
      * given attributes whose (value-specific) combination covers at least
      * `threshold` of the rows, wildcard positions null. One `cube` pass
      * computes ALL 2^k−1 subset aggregations with partial+final hash aggs —
      * a single shuffle regardless of k; the total for the percent column is
      * the cube's own grand-total row, broadcast back (single-row cross
      * join), so the fact table is scanned once and nothing collects.
      * Deviations (documented): attributes are explicit (Kusto baskets every
      * column, binning numerics) and no SegmentId ordinal is emitted.
      * `autocluster` parses to the same mining with Kusto's default 0.05
      * support — its size-weight segment scoring is approximated by the
      * support threshold. */
    def basket(cols: Seq[String], threshold: Double): DataFrame = {
      require(cols.nonEmpty, "basket requires at least one attribute column")
      val k = cols.size
      val allWild = (1 << k) - 1
      val cubed = df.cube(cols.map(col): _*)
        .agg(count(lit(1)).as("count_"), grouping_id().as("__gid"))
      val total = cubed.filter(col("__gid") === allWild)
        .select(col("count_").as("__total"))
      cubed.filter(col("__gid") =!= allWild)
        .crossJoin(broadcast(total))
        .filter(col("count_") >= lit(threshold) * col("__total"))
        .withColumn("percent", col("count_") * lit(100.0) / col("__total"))
        .drop("__gid", "__total")
    }

    /** `T | evaluate diffpatterns(split, 'a', 'b', c1, ..., ck)` — KQL's
      * diffpatterns plugin: attribute-value combinations whose frequency
      * differs between the two row splits. Rows are restricted to the two
      * split values, then ONE cube pass computes CountA/CountB for all
      * 2^k−1 attribute subsets (conditional sums — partial+final hash agg,
      * single shuffle); the cube's own grand-total row supplies the per-side
      * totals for the percent columns (broadcast single-row join, no second
      * scan). A combination is kept when it covers at least `threshold` of
      * EITHER side (Kusto's default 0.05). Deviations (documented, same
      * contract as basket): attributes are explicit rather than auto-chosen,
      * and no SegmentId ordinal is emitted. */
    def diffPatterns(split: String, valA: String, valB: String,
        cols: Seq[String], threshold: Double = 0.05): DataFrame = {
      require(cols.nonEmpty, "diffpatterns requires at least one attribute column")
      val s = col(split).cast("string")
      val allWild = (1 << cols.size) - 1
      val cubed = df.filter(s.isin(valA, valB))
        .cube(cols.map(col): _*)
        .agg(sum(when(s === valA, 1L).otherwise(0L)).as("count_a"),
          sum(when(s === valB, 1L).otherwise(0L)).as("count_b"),
          grouping_id().as("__gid"))
      val total = cubed.filter(col("__gid") === allWild)
        .select(col("count_a").as("__ta"), col("count_b").as("__tb"))
      cubed.filter(col("__gid") =!= allWild)
        .crossJoin(broadcast(total))
        .filter(col("count_a") >= lit(threshold) * col("__ta") ||
          col("count_b") >= lit(threshold) * col("__tb"))
        .withColumn("percent_a", col("count_a") * lit(100.0) / col("__ta"))
        .withColumn("percent_b", col("count_b") * lit(100.0) / col("__tb"))
        .withColumn("percent_diff_ab", col("percent_a") - col("percent_b"))
        .drop("__gid", "__ta", "__tb")
    }

    /** `T | evaluate diffpatterns_text(textCol, split, 'a', 'b'[,
      * threshold])` — tokens whose row-presence frequency differs between
      * two row splits. Tokenization is lowercase + split on non-alphanumeric
      * runs, DISTINCT per row (presence, not term frequency); one explode +
      * one hash agg of conditional sums per token, with the two split totals
      * funded by a broadcast single-row agg — the shuffle carries (token,
      * count) pairs, never documents. Deviation (documented): Kusto mines
      * wildcard token PATTERNS; this engine contrasts single-token presence
      * (the deterministic, oracle-replayable core of the same signal). */
    def diffPatternsText(textCol: String, splitCol: String, valA: String,
        valB: String, threshold: Double = 0.05): DataFrame = {
      val s = col(splitCol).cast("string")
      val inSplit = df.filter(s.isin(valA, valB))
      val toks = inSplit
        .select(s.as("__s"),
          explode(array_distinct(split(lower(col(textCol)), "[^a-z0-9]+"))).as("token"))
        .filter(col("token") =!= "")
      val counts = toks.groupBy("token")
        .agg(sum(when(col("__s") === valA, 1L).otherwise(0L)).as("count_a"),
          sum(when(col("__s") === valB, 1L).otherwise(0L)).as("count_b"))
      val total = inSplit.groupBy()
        .agg(sum(when(s === valA, 1L).otherwise(0L)).as("__ta"),
          sum(when(s === valB, 1L).otherwise(0L)).as("__tb"))
      counts.crossJoin(broadcast(total))
        .filter(col("count_a") >= lit(threshold) * col("__ta") ||
          col("count_b") >= lit(threshold) * col("__tb"))
        .withColumn("percent_a", col("count_a") * lit(100.0) / col("__ta"))
        .withColumn("percent_b", col("count_b") * lit(100.0) / col("__tb"))
        .withColumn("percent_diff_ab", col("percent_a") - col("percent_b"))
        .drop("__ta", "__tb")
    }

    /** `T | evaluate activity_counts_metrics(id, ts, start, end, step)` —
      * KQL's activity-counts plugin: per time bin, total events (`count_`),
      * distinct actors (`dcount`), first-ever-seen actors (`new_dcount`) and
      * the running distinct total (`aggregated_dcount`). Two hash aggs over
      * the fact table (by bin, by id) — both partial+final, one shuffle each;
      * the cumulative sum runs over the AGGREGATED per-bin rows, whose count
      * is bounded by (end−start)/step (a query constant, not data-sized), so
      * the unpartitioned window is safe at any corpus scale. Bins with no
      * rows are omitted (Kusto emits them only when materialize_to_default).
      * Deviations: per-dimension splits are not supported; bins align to the
      * epoch grid (`bin()`), not `bin_at(start)` — pass an aligned start. */
    def activityCountsMetrics(idCol: String, tsCol: String, start: Column,
        end: Column, stepSeconds: Long): DataFrame = {
      val binned = df.filter(col(tsCol) >= start && col(tsCol) < end)
        .select(col(idCol).as("__id"), Bin.ts(col(tsCol), stepSeconds).as("__bin"))
      val perBin = binned.groupBy("__bin")
        .agg(count(lit(1)).as("count_"), countDistinct(col("__id")).as("dcount"))
      val newPerBin = binned.groupBy("__id").agg(min(col("__bin")).as("__fb"))
        .groupBy(col("__fb").as("__bin")).agg(count(lit(1)).as("new_dcount"))
      val w = Window.orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perBin.join(newPerBin, Seq("__bin"), "left_outer")
        .na.fill(0L, Seq("new_dcount"))
        .withColumn("aggregated_dcount", sum(col("new_dcount")).over(w))
        .withColumnRenamed("__bin", tsCol)
    }

    /** `T | evaluate sliding_window_counts(id, ts, lookback, step, start,
      * end)` — events and distinct actors inside a lookback window ending at
      * each bin. Each event row contributes to the lookback/step windows that
      * can see it: a 2-column (id, bin) projection is exploded forward by
      * that fixed factor, then ONE hash agg groups by window — shuffle
      * carries only (id, window) pairs, never source rows, and the blow-up
      * factor is a query constant (e.g. 7 for 7d/1d). Windows with no
      * contributing events are omitted. */
    def slidingWindowCounts(idCol: String, tsCol: String, lookbackSeconds: Long,
        stepSeconds: Long, start: Column, end: Column): DataFrame = {
      require(lookbackSeconds % stepSeconds == 0 && lookbackSeconds >= stepSeconds,
        "sliding_window_counts lookback must be a positive multiple of step")
      val binned = df.filter(col(tsCol) >= start && col(tsCol) < end)
        .select(col(idCol).as("__id"), Bin.ts(col(tsCol), stepSeconds).as("__bin"))
      val contrib = binned.withColumn("__win", explode(sequence(col("__bin"),
          col("__bin") + expr(s"INTERVAL ${lookbackSeconds - stepSeconds} SECONDS"),
          expr(s"INTERVAL $stepSeconds SECONDS"))))
        .filter(col("__win") < end)
      contrib.groupBy(col("__win").as(tsCol))
        .agg(count(lit(1)).as("count_"), countDistinct(col("__id")).as("dcount"))
    }

    /** `T | evaluate activity_engagement(id, ts, innerWindow, outerWindow)` —
      * engagement ratio (e.g. DAU/WAU): distinct actors in each inner bin vs
      * distinct actors in the outer window ending at that bin. The corpus is
      * reduced to DISTINCT (id, inner-bin) pairs first (one agg), so the
      * outer-window explode (factor outer/inner) runs over the deduplicated
      * pair set, not raw events. Rows emit only for bins with inner activity
      * (inner join), matching engaged-bin semantics. */
    def activityEngagement(idCol: String, tsCol: String, innerSeconds: Long,
        outerSeconds: Long): DataFrame = {
      require(outerSeconds % innerSeconds == 0 && outerSeconds >= innerSeconds,
        "activity_engagement outer window must be a positive multiple of the inner window")
      val pairs = df
        .select(col(idCol).as("__id"), Bin.ts(col(tsCol), innerSeconds).as("__bin"))
        .distinct()
      val inner = pairs.groupBy("__bin")
        .agg(count(lit(1)).as("dcount_activities_inner"))
      val outer = pairs.withColumn("__win", explode(sequence(col("__bin"),
          col("__bin") + expr(s"INTERVAL ${outerSeconds - innerSeconds} SECONDS"),
          expr(s"INTERVAL $innerSeconds SECONDS"))))
        .groupBy(col("__win").as("__bin"))
        .agg(countDistinct(col("__id")).as("dcount_activities_outer"))
      inner.join(outer, Seq("__bin"))
        .withColumn("activity_ratio", col("dcount_activities_inner").cast("double") /
          col("dcount_activities_outer"))
        .withColumnRenamed("__bin", tsCol)
    }

    /** `T | evaluate new_activity_metrics(id, ts, start, end, window)` —
      * period-over-period retention: per window bin, distinct actors
      * (`dcount`), first-ever-seen (`new_dcount`), actors also active in the
      * PREVIOUS bin (`returning_dcount`), previous-bin actors who did not
      * come back (`lost_dcount`), and retention/churn rates against the
      * previous bin's population. Everything is equi-joins of the distinct
      * (id, bin) pair set against itself shifted by one window — partial+
      * final aggs, no windows over data-sized rows. Bins with no current
      * activity are omitted (a fully-churned bin has no anchor row);
      * rates are 0.0 when there is no previous bin. Bins align to the epoch
      * grid (deviation from Kusto's bin_at(start), as documented for
      * activity_counts_metrics). */
    def newActivityMetrics(idCol: String, tsCol: String, start: Column,
        end: Column, stepSeconds: Long): DataFrame = {
      val step = expr(s"INTERVAL $stepSeconds SECONDS")
      val pairs = df.filter(col(tsCol) >= start && col(tsCol) < end)
        .select(col(idCol).as("__id"), Bin.ts(col(tsCol), stepSeconds).as("__bin"))
        .distinct()
      val perBin = pairs.groupBy("__bin").agg(count(lit(1)).as("dcount"))
      val newPerBin = pairs.groupBy("__id").agg(min(col("__bin")).as("__fb"))
        .groupBy(col("__fb").as("__bin")).agg(count(lit(1)).as("new_dcount"))
      val shifted = pairs.select(col("__id"), (col("__bin") + step).as("__bin"))
      val ret = pairs.join(shifted, Seq("__id", "__bin"))
        .groupBy("__bin").agg(count(lit(1)).as("returning_dcount"))
      val lost = shifted.join(pairs, Seq("__id", "__bin"), "left_anti")
        .groupBy("__bin").agg(count(lit(1)).as("lost_dcount"))
      val prev = perBin.select((col("__bin") + step).as("__bin"),
        col("dcount").as("__prev"))
      perBin.join(newPerBin, Seq("__bin"), "left_outer")
        .join(ret, Seq("__bin"), "left_outer")
        .join(lost, Seq("__bin"), "left_outer")
        .join(prev, Seq("__bin"), "left_outer")
        .na.fill(0L, Seq("new_dcount", "returning_dcount", "lost_dcount"))
        .withColumn("retention_rate",
          when(coalesce(col("__prev"), lit(0L)) === 0, lit(0.0))
            .otherwise(col("returning_dcount").cast("double") / col("__prev")))
        .withColumn("churn_rate",
          when(coalesce(col("__prev"), lit(0L)) === 0, lit(0.0))
            .otherwise(col("lost_dcount").cast("double") / col("__prev")))
        .drop("__prev")
        .withColumnRenamed("__bin", tsCol)
    }

    /** `T | evaluate activity_metrics(id, ts, start, end, window)` — the base
      * member of the activity family: per window bin, distinct actors
      * (`dcount_values`), first-ever-seen actors (`dcount_newvalues`), and
      * retention/churn rates against the previous bin's population. Kusto's
      * plugin pair shares the definition with new_activity_metrics; this is
      * the canonical-name readout of [[newActivityMetrics]] — same
      * distributed shape (equi-joins over the distinct (id, bin) pair set,
      * partial+final aggs, no data-sized windows) and the same documented
      * deviations (epoch-grid bins, empty bins omitted). */
    def activityMetrics(idCol: String, tsCol: String, start: Column,
        end: Column, stepSeconds: Long): DataFrame =
      newActivityMetrics(idCol, tsCol, start, end, stepSeconds)
        .select(col(tsCol), col("dcount").as("dcount_values"),
          col("new_dcount").as("dcount_newvalues"),
          col("retention_rate"), col("churn_rate"))

    /** `T | evaluate active_users_count(id, ts, lookback, step, minPeriods,
      * start, end)` — per step bin, the distinct actors with activity in at
      * least `minPeriods` DISTINCT step-periods inside the lookback window
      * ending at that bin. The corpus reduces to distinct (id, period-bin)
      * pairs first (one agg); each pair then contributes to the
      * lookback/step windows that can see it (a constant blow-up factor,
      * e.g. 7 for 7d/1d), and one hash agg per (window, id) counts periods
      * before the ≥ minPeriods filter and the final per-window count —
      * shuffles carry only (id, bin) pairs, never source rows. Windows with
      * no qualifying actors are omitted. Bins align to the epoch grid
      * (deviation, as documented for activity_counts_metrics). */
    def activeUsersCount(idCol: String, tsCol: String, lookbackSeconds: Long,
        stepSeconds: Long, minPeriods: Int, start: Column, end: Column): DataFrame = {
      require(lookbackSeconds % stepSeconds == 0 && lookbackSeconds >= stepSeconds,
        "active_users_count lookback must be a positive multiple of step")
      val pairs = df.filter(col(tsCol) >= start && col(tsCol) < end)
        .select(col(idCol).as("__id"), Bin.ts(col(tsCol), stepSeconds).as("__bin"))
        .distinct()
      val contrib = pairs.withColumn("__win", explode(sequence(col("__bin"),
          col("__bin") + expr(s"INTERVAL ${lookbackSeconds - stepSeconds} SECONDS"),
          expr(s"INTERVAL $stepSeconds SECONDS"))))
        .filter(col("__win") < end)
      contrib.groupBy(col("__win"), col("__id"))
        .agg(count(lit(1)).as("__np"))
        .filter(col("__np") >= minPeriods)
        .groupBy(col("__win").as(tsCol))
        .agg(count(lit(1)).as("dcount"))
    }

    /** `T | evaluate session_count(id, ts, start, end, bin, lookback)` —
      * session starts per bin, where a session starts at an event with no
      * same-actor activity in the preceding `lookback` seconds (the same
      * idle-gap contract as the sessionization operators). Execution: one
      * window pass partitioned BY ACTOR (a lag over ts — never an
      * unpartitioned window), then a partial+final count per bin. Deviation
      * (documented): emits the session-START bin, not Kusto's per-bin
      * active-session rollup; bins align to the epoch grid. */
    def sessionCount(idCol: String, tsCol: String, start: Column, end: Column,
        binSeconds: Long, lookbackSeconds: Long): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col(tsCol))
      df.filter(col(tsCol) >= start && col(tsCol) < end)
        .withColumn("__prev", lag(col(tsCol), 1).over(w))
        .filter(col("__prev").isNull ||
          col(tsCol).cast("long") - col("__prev").cast("long") > lookbackSeconds)
        .groupBy(Bin.ts(col(tsCol), binSeconds).as(tsCol))
        .agg(count(lit(1)).as("count_"))
    }

    /** `T | evaluate rolling_percentile(value, p, ts, step, binsPerWindow)`
      * — per step bin, the exact p-th percentile of `value` over the last
      * `binsPerWindow` bins (current bin inclusive). Each (value, bin) row
      * is exploded forward by the constant binsPerWindow factor, then ONE
      * exact interpolating percentile agg per window (the same contract as
      * the summarize percentile, deterministic on integral data) — the
      * shuffle carries (window, value) pairs and the blow-up is a query
      * constant. Windows emit only where a source bin contributes. */
    def rollingPercentile(valueCol: String, p: Double, tsCol: String,
        stepSeconds: Long, binsPerWindow: Int): DataFrame = {
      require(binsPerWindow >= 1, "rolling_percentile needs binsPerWindow >= 1")
      val binned = df.select(col(valueCol).as("__v"),
        Bin.ts(col(tsCol), stepSeconds).as("__bin"))
      val contrib = binned.withColumn("__win", explode(sequence(col("__bin"),
          col("__bin") + expr(s"INTERVAL ${(binsPerWindow - 1) * stepSeconds} SECONDS"),
          expr(s"INTERVAL $stepSeconds SECONDS"))))
      contrib.groupBy(col("__win").as(tsCol))
        .agg(percentile(col("__v"), lit(p / 100.0))
          .as(s"percentile_${valueCol}_${p.toInt}"))
    }

    /** `T | evaluate rows_near(cond, numRows[, rowsAfter])` over a serialized
      * order — keep every row within `numRows` rows BEFORE or `rowsAfter`
      * rows AFTER any row satisfying `cond` (Kusto's context-rows plugin;
      * `rowsAfter` defaults to `numRows`).
      *
      * Execution: global row indexes come from the distributed serialized
      * numbering (serializedRowFns — no single-partition exchange), then
      * anchor rows are bucketed on `floor(idx / w)` with
      * `w = numRows + rowsAfter + 1` so each anchor's span covers at most two
      * buckets; the output is ONE hash LEFT SEMI equi-join on the bucket key
      * with the range check as a residual — never a broadcast requirement,
      * never a nested-loop join, and the semi form dedups rows matched by
      * several anchors for free. Anchors shuffle at ≤2 rows each; the data
      * side shuffles once on an 8-byte key. Scale-safe at any anchor count. */
    def rowsNear(order: Seq[Column], cond: Column, numRows: Int,
        rowsAfter: Int): DataFrame = {
      require(numRows >= 0 && rowsAfter >= 0,
        "rows_near needs non-negative row distances")
      val idx = "__rn_idx"
      val withIdx = serializedRowFns(df, order, Seq(RowNumber(idx)))
      val w = numRows.toLong + rowsAfter.toLong + 1L
      val anchors = withIdx.filter(cond)
        .select(col(idx).as("__rn_a"))
        .withColumn("__rn_b", explode(array(
          floor((col("__rn_a") - numRows) / w),
          floor((col("__rn_a") + rowsAfter) / w))))
        .select(col("__rn_b"), col("__rn_a")).distinct()
      withIdx.join(anchors,
          floor(col(idx) / w) === col("__rn_b") &&
            col(idx) >= col("__rn_a") - numRows &&
            col(idx) <= col("__rn_a") + rowsAfter,
          "left_semi")
        .drop(idx)
    }

    /** `T | evaluate sequence_detect(ts, stepWindow, spanWindow, s1, …, sk,
      * id)` — per-actor ordered sequence detection: one output row per
      * occurrence of step 1 whose chain completes, each subsequent step
      * matched GREEDILY (earliest row strictly after the previous step,
      * within stepWindow) and the whole chain within spanWindow. Output
      * columns are the step names, holding each step's timestamp.
      *
      * Execution: k−1 passes; each unions the surviving chain heads with the
      * next step's candidate rows and takes, per actor in one ordered window
      * (ts asc, candidates-before-heads on ties → strictly-after semantics),
      * the first FOLLOWING candidate timestamp — one shuffle on the actor key
      * per step, O(1) state per row, no self-join blow-up. Deviation
      * (documented): overlapping chains may share later-step rows (each step-1
      * occurrence is matched independently, which is also how the oracle
      * states it). */
    def sequenceDetect(tsCol: String, idCol: String, stepNames: Seq[String],
        maxStepSeconds: Long, maxSpanSeconds: Long): DataFrame = {
      require(stepNames.size >= 2, "sequence_detect needs at least two steps")
      val stepIv = expr(s"INTERVAL $maxStepSeconds SECONDS")
      // distinct: two step-1 events sharing (actor, ts) are ONE chain head —
      // per-occurrence semantics are stated per distinct timestamp, matching
      // the oracle's per-(actor, t1) grouping
      var heads = df.filter(col(stepNames.head))
        .select(col(idCol).as("__id"), col(tsCol).as(stepNames.head))
        .distinct()
      for (i <- 1 until stepNames.size) {
        val prevN = stepNames(i - 1)
        val curN = stepNames(i)
        val carried = heads.columns.filter(_ != "__id").toSeq
        val headsF = heads
          .withColumn("__cts", col(prevN)).withColumn("__flag", lit(0))
        val candsF = carried.foldLeft(
            df.filter(col(curN)).select(col(idCol).as("__id"),
              col(tsCol).as("__cts"), lit(1).as("__flag"))) {
          (d, c) => d.withColumn(c, lit(null).cast("timestamp"))
        }.select(headsF.columns.map(col).toIndexedSeq: _*)
        val w = Window.partitionBy("__id")
          .orderBy(col("__cts").asc, col("__flag").desc)
          .rowsBetween(1, Window.unboundedFollowing)
        heads = headsF.unionByName(candsF)
          .withColumn(curN,
            first(when(col("__flag") === 1, col("__cts")), ignoreNulls = true).over(w))
          .filter(col("__flag") === 0 && col(curN).isNotNull &&
            col(curN) <= col(prevN) + stepIv)
          .select((col("__id") +: stepNames.take(i + 1).map(col)).toIndexedSeq: _*)
      }
      heads.filter(col(stepNames.last) <=
          col(stepNames.head) + expr(s"INTERVAL $maxSpanSeconds SECONDS"))
        .withColumnRenamed("__id", idCol)
    }

    /** `T | evaluate funnel_sequence(id, ts, start, end, stepWindow, state,
      * dynamic(['a','b','c']))` — who funnels through the given state
      * sequence, and from/to where: detects greedy per-actor chains of the
      * states (sequence_detect machinery, earliest-strictly-after within
      * stepWindow per step), then for each completed chain finds the state
      * immediately BEFORE the chain start and immediately AFTER the chain end
      * (two ordered window passes over a union of chains and raw rows — one
      * shuffle on the actor key each, no self-joins), and returns
      * `prev × next → dcount` of distinct actors (nulls = chain at the
      * history edge). Kusto's plugin emits the same prev/next distribution. */
    def funnelSequence(idCol: String, tsCol: String, stateCol: String,
        start: Column, end: Column, maxStepSeconds: Long,
        states: Seq[String]): DataFrame = {
      require(states.size >= 2, "funnel_sequence needs at least two states")
      val base = df.filter(col(tsCol) >= start && col(tsCol) < end)
        .select(col(idCol).as("__fid"), col(tsCol).as("__fts"),
          col(stateCol).cast("string").as("__fst"))
      val stepNames = states.indices.map(i => s"__fs$i")
      val flagged = stepNames.zip(states).foldLeft(base) {
        case (d, (n, v)) => d.withColumn(n, col("__fst") === v)
      }
      // span = stepWindow·(k−1) is implied by the per-step windows
      val chains = flagged.sequenceDetect("__fts", "__fid", stepNames,
        maxStepSeconds, maxStepSeconds * (states.size - 1))
      val rows = base.select(col("__fid"), col("__fts").as("__cts"),
        col("__fst"), lit(1).as("__flag"))
      def boundaryPass(ch: DataFrame, anchor: String, outName: String,
          before: Boolean): DataFrame = {
        val chF = ch.withColumn("__cts", col(anchor)).withColumn("__flag", lit(0))
          .withColumn("__fst", lit(null).cast("string"))
        // null-fill with each chain column's ACTUAL type (step columns are
        // timestamps, but the second pass also carries the string `prev`)
        val chTypes = chF.schema.map(f => f.name -> f.dataType).toMap
        val rowsF = ch.columns.filter(c => c != "__fid")
          .foldLeft(rows)((d, c) =>
            if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(chTypes(c))))
          .select(chF.columns.map(col).toIndexedSeq: _*)
        // tie order keeps same-ts raw rows OUT of the frame: strictly
        // before/after the anchor row. The trailing __fst key makes the
        // pick deterministic when two raw rows share a timestamp (before →
        // max state at the latest prior ts, after → min state at the
        // earliest following ts), so the oracle can state the same rule.
        val ord = if (before) Seq(col("__cts").asc, col("__flag").asc, col("__fst").asc)
                  else Seq(col("__cts").asc, col("__flag").desc, col("__fst").asc)
        val w = Window.partitionBy("__fid").orderBy(ord: _*)
        val picked =
          if (before) last(when(col("__flag") === 1, col("__fst")), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, -1))
          else first(when(col("__flag") === 1, col("__fst")), ignoreNulls = true)
            .over(w.rowsBetween(1, Window.unboundedFollowing))
        chF.unionByName(rowsF).withColumn(outName, picked)
          .filter(col("__flag") === 0)
          .drop("__cts", "__flag", "__fst")
      }
      val withPrev = boundaryPass(chains, stepNames.head, "prev", before = true)
      val withNext = boundaryPass(withPrev, stepNames.last, "next", before = false)
      withNext.groupBy(col("prev"), col("next"))
        .agg(countDistinct(col("__fid")).as("dcount"))
    }

    /** `T | evaluate funnel_sequence_completion(id, ts, start, end, state,
      * dynamic(['s1',…,'sk']), dynamic([w1,…,wm]))` — funnel completion per
      * time budget: for every window wⱼ and sequence prefix s1..sᵢ, the
      * distinct actors whose greedy chain (sequence_detect machinery,
      * step-and-span window wⱼ) completes the prefix. Output: (duration,
      * step_idx, step, dcount) — m·k bounded aggregate rows. Deviation from
      * Kusto (documented): no timeline binning; the per-window completion
      * table is the funnel itself. */
    def funnelSequenceCompletion(idCol: String, tsCol: String, stateCol: String,
        start: Column, end: Column, states: Seq[String],
        windows: Seq[Long]): DataFrame = {
      require(states.size >= 2, "funnel_sequence_completion needs >= 2 states")
      require(windows.nonEmpty, "funnel_sequence_completion needs >= 1 window")
      val base = df.filter(col(tsCol) >= start && col(tsCol) < end)
        .select(col(idCol).as("__fid"), col(tsCol).as("__fts"),
          col(stateCol).cast("string").as("__fst"))
      val stepNames = states.indices.map(i => s"__fs$i")
      val flagged = stepNames.zip(states).foldLeft(base) {
        case (d, (n, v)) => d.withColumn(n, col("__fst") === v)
      }
      val parts = for (w <- windows; i <- states.indices) yield {
        val counted =
          if (i == 0)
            flagged.filter(col(stepNames.head))
              .agg(countDistinct(col("__fid")).as("dcount"))
          else
            flagged.sequenceDetect("__fts", "__fid", stepNames.take(i + 1), w, w)
              .agg(countDistinct(col("__fid")).as("dcount"))
        counted.select(lit(w).as("duration"), lit(i.toLong).as("step_idx"),
          lit(states(i)).as("step"), col("dcount"))
      }
      parts.reduce(_ unionByName _)
    }

    /** `T | evaluate ipv4_lookup(RangeTable, ipCol, networkCol
      * [, return_unmatched])` — enrich each row with the LONGEST-prefix CIDR
      * range containing its IPv4 address.
      *
      * Execution (the bucketed range-join pattern, like the LSH bands): the
      * DISTINCT prefix lengths in the range table are collected (bounded —
      * ≤ 33 exist), each fact row emits one masked-address candidate key per
      * length, and candidates equi-join the (length, network) pairs — a
      * broadcast hash join on 8-byte keys, never an interval cross-join. The
      * longest match per row wins (ties: smallest network, a documented
      * deterministic rule). `return_unmatched=true` keeps unmatched rows with
      * null range columns (left join on a synthetic row id). */
    def ipv4Lookup(ranges: DataFrame, ipCol: String, netCol: String,
        returnUnmatched: Boolean = false): DataFrame = {
      import graft.functions.KqlFunctions
      val lenOf = when(size(split(col(netCol), "/")) > 1,
        element_at(split(col(netCol), "/"), 2).cast("int")).otherwise(lit(32))
      val lk = ranges
        .withColumn("__len", lenOf)
        .withColumn("__base", KqlFunctions.parseIpv4(col(netCol)))
        .filter(col("__base").isNotNull)
      val lens: Seq[Int] = lk.select("__len").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted // bounded: at most 33 values
      require(lens.nonEmpty, "ipv4_lookup: range table has no valid networks")
      val withId = df.withColumn("__rid", monotonically_increasing_id())
        .withColumn("__ip", KqlFunctions.parseIpv4(col(ipCol)))
      val cand = withId
        .withColumn("__len", explode(array(lens.map(lit): _*)))
        .withColumn("__key", KqlFunctions.ipMask(col("__ip"), col("__len")))
      val hit = cand.join(broadcast(lk), Seq("__len"))
        .filter(col("__key") === col("__base"))
      val w = Window.partitionBy("__rid")
        .orderBy(col("__len").desc, col("__base").asc)
      val best = hit.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__len", "__key", "__base", "__ip", "__rn")
      if (!returnUnmatched) best.drop("__rid")
      else {
        val extraCols = ranges.columns.toSeq
        withId.drop("__ip").join(
          best.select((col("__rid") +: extraCols.map(col)).toIndexedSeq: _*),
          Seq("__rid"), "left").drop("__rid")
      }
    }

    /** `T | evaluate ipv6_lookup(RangeTable, ipCol, netCol[, return_unmatched])`
      * — the ipv4_lookup shape lifted to 128 bits: addresses canonicalize to
      * 32 hex digits (KqlFunctions.parseIpv6, colon-stripped) where prefix
      * masking is whole hex digits plus one bit-masked boundary digit — pure
      * string/integer arithmetic, no 128-bit numerics needed. The range table
      * contributes one masked-key equi-join PER DISTINCT prefix length
      * (bounded ≤129, collected once like ipv4's ≤33); candidates broadcast-
      * hash-join on (length, masked key) and the longest prefix per row wins
      * (ties: smallest network). Never an interval or cross join. */
    def ipv6Lookup(ranges: DataFrame, ipCol: String, netCol: String,
        returnUnmatched: Boolean = false): DataFrame = {
      import graft.functions.KqlFunctions
      def hex32(c: Column): Column = translate(KqlFunctions.parseIpv6(c), ":", "")
      def maskAt(h: Column, len: Int): Column = {
        val full = len / 4; val rem = len % 4
        val head = substring(h, 1, full)
        if (rem == 0) rpad(head, 32, "0")
        else {
          val d = conv(substring(h, full + 1, 1), 16, 10).cast("int")
          val m = d.bitwiseAND(lit(~((1 << (4 - rem)) - 1) & 0xF))
          rpad(concat(head, lower(conv(m.cast("string"), 10, 16))), 32, "0")
        }
      }
      val lenOf = when(size(split(col(netCol), "/")) > 1,
        element_at(split(col(netCol), "/"), 2).cast("int")).otherwise(lit(128))
      val lk0 = ranges
        .withColumn("__len", lenOf)
        .withColumn("__net6", hex32(element_at(split(col(netCol), "/"), 1)))
        .filter(col("__net6").isNotNull && col("__len").between(0, 128))
      val lens: Seq[Int] = lk0.select("__len").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted // bounded: at most 129 values
      require(lens.nonEmpty, "ipv6_lookup: range table has no valid networks")
      // align each network base to its own prefix (defensive, like Kusto)
      val lk = lk0.withColumn("__base",
        lens.foldLeft(lit(null).cast("string")) { (acc, l) =>
          when(col("__len") === l, maskAt(col("__net6"), l)).otherwise(acc)
        }).drop("__net6")
      val withId = df.withColumn("__rid", monotonically_increasing_id())
        .withColumn("__ip6", hex32(col(ipCol)))
      val cand = withId
        .withColumn("__len", explode(array(lens.map(lit): _*)))
        .withColumn("__key",
          lens.foldLeft(lit(null).cast("string")) { (acc, l) =>
            when(col("__len") === l, maskAt(col("__ip6"), l)).otherwise(acc)
          })
      val hit = cand.join(broadcast(lk), Seq("__len"))
        .filter(col("__key") === col("__base"))
      val w = Window.partitionBy("__rid")
        .orderBy(col("__len").desc, col("__base").asc)
      val best = hit.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__len", "__key", "__base", "__ip6", "__rn")
      if (!returnUnmatched) best.drop("__rid")
      else {
        val extraCols = ranges.columns.toSeq
        withId.drop("__ip6").join(
          best.select((col("__rid") +: extraCols.map(col)).toIndexedSeq: _*),
          Seq("__rid"), "left").drop("__rid")
      }
    }

    /** The geo lookup plugins' result for an EMPTY lookup table: every fact
      * row with null lookup columns under return_unmatched, else no rows —
      * with the same column order as the joined path. */
    private def emptyLookupResult(lookup: DataFrame, keyCol: String,
        returnUnmatched: Boolean, returnLookupKey: Boolean): DataFrame = {
      val keep = lookup.columns.toSeq.filter(c => returnLookupKey || c != keyCol)
      val nulls = keep.map(c => lit(null).cast(lookup.schema(c).dataType).as(c))
      val base = if (returnUnmatched) df else df.limit(0)
      base.select(df.columns.map(col).toIndexedSeq ++ nulls: _*)
    }

    /** Max S2 level at which every cell's MIN WIDTH still exceeds `radius`
      * meters (quadratic min-width metric ≈ 0.833/2^L rad ≈ 5.3e6/2^L m;
      * 4.0e6 keeps margin) — then a radius-ball around any covered cell
      * stays inside that cell's 3×3 neighbor block. */
    private def radiusCappedLevel(radiusMeters: Double): Int =
      math.max(0, math.min(16,
        math.floor(math.log(4.0e6 / radiusMeters) / math.log(2.0)).toInt))

    /** Re-anchor an antimeridian-crossing [[lng,lat],…] geometry (raw-lng
      * span > 180°) into the contiguous [0,360) frame: negative lngs += 360.
      * The covering machinery tests each cell box AND its +360 image
      * (S2Expressions.coverRing/coverPolyline `wrap`), and the lookup
      * residual shifts the point's longitude the same way — one consistent
      * planar frame end to end, so antimeridian polygons/lines are no
      * longer silently dropped from lookup results (they used to cover()
      * to null). Runs ONCE per geometry on the tiny broadcast build side;
      * non-crossing geometries pass through unchanged. */
    private def anchorAntimeridian(geom: Column): Column = {
      val lngs = transform(geom, p => element_at(p, 1))
      when(array_max(lngs) - array_min(lngs) > lit(180.0),
        transform(geom, p => array(
          when(element_at(p, 1) < 0, element_at(p, 1) + lit(360.0))
            .otherwise(element_at(p, 1)),
          element_at(p, 2)))).otherwise(geom)
    }

    /** True when [[anchorAntimeridian]] shifted this geometry (a lng > 180
      * exists) — the residual must then shift the probe point's lng too. */
    private def inAnchoredFrame(geomA: Column): Column =
      array_max(transform(geomA, p => element_at(p, 1))) > lit(180.0)

    /** Covering cells plus their 8 neighbors each, deduped — the build-side
      * one-ring expansion that makes radius matching complete while the
      * fact side keeps ONE key per row. */
    private def withNeighborRing(cover: Column): Column =
      array_distinct(flatten(transform(cover,
        c => concat(array(c), call_function("graft_s2_neighbors", c)))))

    /** Shared fact side of the geo lookup plugins: an optional row id (only
      * under return_unmatched — the inner path stays deterministic for
      * streams) and one (level, cell) key pair per collected level. */
    private def lookupCandidates(lngCol: String, latCol: String,
        lvls: Seq[Int], returnUnmatched: Boolean): (DataFrame, DataFrame) = {
      val withId =
        if (returnUnmatched) df.withColumn("__rid", monotonically_increasing_id())
        else df
      val cand = withId
        .withColumn("__lvl", explode(array(lvls.map(lit): _*)))
        .withColumn("__cell", call_function("graft_s2_cell",
          col(lngCol).cast("double"), col(latCol).cast("double"), col("__lvl")))
      (withId, cand)
    }

    /** Shared tail of the geo lookup plugins: drop the geometry column
      * unless return_lookup_key, and left-join matches back onto the
      * id-carrying fact rows under return_unmatched. */
    private def lookupTail(hit0: DataFrame, withId: DataFrame,
        lookup: DataFrame, keyCol: String, returnUnmatched: Boolean,
        returnLookupKey: Boolean): DataFrame = {
      val hit = if (returnLookupKey) hit0 else hit0.drop(keyCol)
      if (!returnUnmatched) hit
      else {
        val extraCols = lookup.columns.toSeq
          .filter(c => returnLookupKey || c != keyCol)
        withId.join(
          hit.select((col("__rid") +: extraCols.map(col)).toIndexedSeq: _*),
          Seq("__rid"), "left").drop("__rid")
      }
    }

    /** Per-geometry adaptive S2 level from a [[lng,lat],…] vertex array's
      * bbox span: cells about half the span (→ coverings of ~4–25 cells),
      * clamped to [0, maxLvl]. The LEVEL spectrum is what gets collected
      * driver-side (≤ maxLvl+1 values — the ipv4_lookup prefix-length
      * pattern), never the geometries. */
    private def adaptiveLevel(geom: Column, maxLvl: Int): Column = {
      val lngs = transform(geom, p => element_at(p, 1).cast("double"))
      val lats = transform(geom, p => element_at(p, 2).cast("double"))
      val span = greatest(
        array_max(lngs) - array_min(lngs), array_max(lats) - array_min(lats))
      val lvl = (floor(log(lit(360.0) / greatest(span, lit(1e-6))) /
        lit(math.log(2.0))) + lit(1)).cast("int")
      greatest(lit(0), least(lit(maxLvl), lvl))
    }

    /** `T | evaluate geo_polygon_lookup(PolygonTable, polygonCol, lngCol,
      * latCol [, return_unmatched])` — enrich each row with the polygon(s)
      * containing its point: THE geofencing enrichment plugin.
      *
      * Execution (the bucketed containment-join engine proven by
      * q_kql_polygon_join, generalized to mixed polygon sizes): each polygon
      * gets an ADAPTIVE fixed S2 level from its bbox (small polygons → fine
      * cells, continents → coarse; covering stays ~4–25 cells regardless of
      * size) and expands to its covering; the DISTINCT levels are collected
      * (bounded ≤ 17) and each fact row emits its ONE cell per level. One
      * broadcast equi-join on (level, cell) + the exact ray-cast residual.
      * Each (point, polygon) pair can meet on at most one cell (one covering
      * level per polygon × one point cell per level) — no dedup step, no
      * pair inflation. Points in several polygons yield several rows
      * (Kusto's contract); `return_unmatched=true` keeps unmatched rows with
      * null polygon columns. Antimeridian-crossing polygons are re-anchored
      * to the [0,360) frame on the build side (anchorAntimeridian) — they
      * cover and match like any other ring; the probe point's lng shifts
      * into the same frame in the residual. */
    def geoPolygonLookup(polys: DataFrame, polyCol: String, lngCol: String,
        latCol: String, returnUnmatched: Boolean = false,
        radiusMeters: Option[Double] = None,
        returnLookupKey: Boolean = true): DataFrame = {
      import graft.functions.KqlFunctions
      val geom = col(polyCol).cast("array<array<double>>")
      // optional radius (Kusto's 5th argument): match polygons within
      // `radius` meters of the point, not just containing it. Same two
      // moves as geo_line_lookup: cap the level so a cell's min width ≥
      // radius, and expand the covering one neighbor ring on the broadcast
      // side — the point's one cell per level must land in it
      val maxLvl = radiusMeters match {
        case Some(r) =>
          require(r > 0, "geo_polygon_lookup: radius must be positive")
          // the 3×3-neighbor-block completeness argument needs a level
          // whose cell min width >= radius; level 0's is ~5.3e6 m, so
          // beyond the 4.0e6 margin constant no level qualifies
          require(r <= 4.0e6,
            "geo_polygon_lookup: radius must be <= 4,000 km (the S2 level-0 " +
              "cell-width completeness bound)")
          radiusCappedLevel(r)
        case None => 16
      }
      // antimeridian-crossing rings are re-anchored to [0,360) on the build
      // side (covering, level and residual all in ONE planar frame)
      val lk0 = polys
        .withColumn("__geomA", anchorAntimeridian(geom))
        .withColumn("__anti", inAnchoredFrame(col("__geomA")))
        .withColumn("__lvl", adaptiveLevel(col("__geomA"), maxLvl))
      val cover = call_function("graft_s2_cover", col("__geomA"), col("__lvl"))
      val lk = lk0.withColumn("__cell", radiusMeters match {
        case Some(_) => explode(withNeighborRing(cover))
        case None => explode(cover)
      })
      val lvls: Seq[Int] = lk0.select("__lvl").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted // bounded: at most 17 values
      // empty lookup table: Kusto returns the unmatched rows (nulls) or an
      // empty result — never a failed query
      if (lvls.isEmpty)
        return emptyLookupResult(polys, polyCol, returnUnmatched, returnLookupKey)
      val (withId, cand) = lookupCandidates(lngCol, latCol, lvls, returnUnmatched)
      // probe lng shifted into the anchored frame for antimeridian rings
      val px = when(col("__anti") && col(lngCol) < 0,
        col(lngCol).cast("double") + lit(360.0))
        .otherwise(col(lngCol).cast("double"))
      val geomA = col("__geomA")
      val residual = radiusMeters match {
        case Some(r) =>
          // distance-to-polygon ≤ r (0 when contained): containment short-
          // circuits the boundary distance
          KqlFunctions.pointInPolygon(px, col(latCol), geomA) ||
            KqlFunctions.pointToLineMeters(px, col(latCol),
              concat(geomA, slice(geomA, 1, 1))) <= lit(r)
        case None =>
          KqlFunctions.pointInPolygon(px, col(latCol), geomA)
      }
      val hit0 = cand.join(broadcast(lk), Seq("__lvl", "__cell"))
        .filter(residual)
        .drop("__lvl", "__cell", "__geomA", "__anti")
      lookupTail(hit0, withId, polys, polyCol, returnUnmatched, returnLookupKey)
    }

    /** `T | evaluate geo_line_lookup(LineTable, lineCol, lngCol, latCol,
      * radius_m [, return_unmatched])` — enrich each row with the line(s)
      * passing within `radius_m` meters of its point (route matching).
      *
      * Same engine as geo_polygon_lookup with two radius twists: the
      * per-line level is additionally capped so a CELL'S MIN WIDTH is at
      * least the radius, and the LINE side's covering expands by one
      * neighbor ring — so a radius-ball around any covered cell stays
      * inside its 3×3 block and the point's ONE cell per level must land
      * in the expanded covering (adjacency is symmetric). The ×9 expansion
      * sits on the tiny broadcast build side, never on the fact stream;
      * each (point, line) pair meets on exactly one cell (one point cell ×
      * deduped covering), so there is no pair inflation, no dedup shuffle,
      * and — like the polygon form — the inner path composes with
      * STREAMING fact sides. Exact residual: distance ≤ radius. */
    def geoLineLookup(lines: DataFrame, lineCol: String, lngCol: String,
        latCol: String, radiusMeters: Double,
        returnUnmatched: Boolean = false,
        returnLookupKey: Boolean = true): DataFrame = {
      import graft.functions.KqlFunctions
      require(radiusMeters > 0, "geo_line_lookup: radius must be positive")
      require(radiusMeters <= 4.0e6,
        "geo_line_lookup: radius must be <= 4,000 km (the S2 level-0 " +
          "cell-width completeness bound)")
      val geom = col(lineCol).cast("array<array<double>>")
      // antimeridian-crossing polylines re-anchored like the polygon form
      val lk0 = lines
        .withColumn("__geomA", anchorAntimeridian(geom))
        .withColumn("__anti", inAnchoredFrame(col("__geomA")))
        .withColumn("__lvl",
          adaptiveLevel(col("__geomA"), radiusCappedLevel(radiusMeters)))
      val lk = lk0.withColumn("__cell", explode(withNeighborRing(
        call_function("graft_s2_cover_line", col("__geomA"), col("__lvl")))))
      val lvls: Seq[Int] = lk0.select("__lvl").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (lvls.isEmpty)
        return emptyLookupResult(lines, lineCol, returnUnmatched, returnLookupKey)
      val (withId, cand) = lookupCandidates(lngCol, latCol, lvls, returnUnmatched)
      val px = when(col("__anti") && col(lngCol) < 0,
        col(lngCol).cast("double") + lit(360.0))
        .otherwise(col(lngCol).cast("double"))
      val hit0 = cand.join(broadcast(lk), Seq("__lvl", "__cell"))
        .filter(KqlFunctions.pointToLineMeters(px, col(latCol),
          col("__geomA")) <= lit(radiusMeters))
        .drop("__lvl", "__cell", "__geomA", "__anti")
      lookupTail(hit0, withId, lines, lineCol, returnUnmatched, returnLookupKey)
    }
  }

  // ------------------------------------------------------------------
  // Serialized row functions, distributed.
  // ------------------------------------------------------------------

  /** A row-function request over a serialized (totally ordered) table — the KQL
    * `serialize` surface: row_number / prev / next / row_cumsum / row_rank_dense /
    * row_window_session. `name` is the output column each request materializes. */
  sealed trait RowFn { def name: String }
  final case class RowNumber(name: String) extends RowFn
  /** prev(e, offset, default): the value of `e` `offset` rows earlier in the
    * serialized order, `default` (null if absent) before the table's start. */
  final case class PrevOf(name: String, e: Column, offset: Int = 1,
                          default: Option[Column] = None) extends RowFn
  final case class NextOf(name: String, e: Column, offset: Int = 1,
                          default: Option[Column] = None) extends RowFn
  /** row_cumsum(term [, restart]): running sum along the serialized order; a
    * row whose `restart` predicate is true resets the accumulation BEFORE
    * adding itself (Kusto semantics). The restart form stays distributed: each
    * row subtracts the global prefix sum as of just before its most recent
    * restart, computed from per-partition local anchors plus a carry composed
    * over the (tiny) per-partition stats table. */
  final case class CumSumOf(name: String, e: Column,
                            restart: Option[Column] = None) extends RowFn
  final case class RankDense(name: String, e: Column) extends RowFn
  /** row_rank_min: the global row number of the first row of the current run of
    * equal `e` values (KQL min-rank; = RANK() when `e` is a leading sort key). */
  final case class RankMin(name: String, e: Column) extends RowFn
  /** Sessionization along the serialized order: the session-start timestamp of the
    * current row; a new session begins when the gap to the previous row exceeds
    * `idleSeconds`, or — when `maxDurationSeconds` is set — when the row is more
    * than that far past the current window's start. The maxDuration restart chain
    * is sequential, but each restart depends only on timestamps INSIDE one
    * idle-gap session, so it is computed as a per-session fold over the distinct
    * event times (emitting only the restart points) and joined back — no
    * single-partition pass over the data. One idle session = one fold group, so
    * a corpus whose idle gap never triggers concentrates its chain on one task;
    * with a maxDuration bound that group's OUTPUT stays small (restart points
    * only), which keeps even that degenerate case cheap. */
  final case class WindowSession(name: String, ts: Column, idleSeconds: Long,
                                 maxDurationSeconds: Option[Long] = None) extends RowFn

  /** Evaluate serialized row functions WITHOUT a single-partition window.
    *
    * KQL `serialize` promises a global row order; `Window.orderBy(...)` with no
    * partition key honors it by sorting the world in ONE task — a 100 TB
    * non-starter. This is the zipWithIndex shape instead:
    *
    *   1. range-partition + sort by the serialized order (partition i holds keys
    *      ≤ partition i+1's — the global order is partition-contiguous);
    *   2. per-partition local windows (row number, lag/lead, running sums) over
    *      `spark_partition_id()`;
    *   3. a tiny per-partition stats table (one row per partition: counts, sums,
    *      first/last values) cross-combined by two broadcast self-joins into
    *      per-partition OFFSETS (rows before, sum before, value carried across
    *      the boundary);
    *   4. broadcast-join the offsets back and combine: global fn = local fn +
    *      partition offset, with first/last-row boundary fixups.
    *
    * Every full-data exchange is distributed (range + hash-by-partition-id); the
    * only single-point work is over the #partitions-row stats table.
    *
    * NOTE: the VALUES honor the serialized order, but the output ROW ORDER is
    * not defined (the pid hash exchange permutes partitions) — like any Spark
    * transformation, follow with an explicit sort when row order matters. */
  def serializedRowFns(df: DataFrame, order: Seq[Column], fns: Seq[RowFn]): DataFrame = {
    val pid = "__ser_pid"
    val lrn = "__ser_lrn"
    import org.apache.spark.sql.SparkSession
    val _ = SparkSession.active
    val localW = Window.partitionBy(col(pid)).orderBy(order: _*)
    val localCumW = localW.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // 1-2. range layout + local row number and per-fn helper columns
    var sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn(lrn, row_number().over(localW))
    fns.foreach {
      case RankDense(n, e) =>
        // internal change indicator (null on each partition's first row: its
        // change-ness depends on the previous partition and resolves via stats)
        sorted = sorted.withColumn(s"__chg_$n",
          when(col(lrn) === 1, lit(null).cast("long"))
            .otherwise((!(e <=> lag(e, 1).over(localW))).cast("long")))
      case RankMin(n, e) =>
        sorted = sorted.withColumn(s"__chg_$n",
          when(col(lrn) === 1, lit(null).cast("long"))
            .otherwise((!(e <=> lag(e, 1).over(localW))).cast("long")))
      case WindowSession(n, ts, idle, _) =>
        sorted = sorted.withColumn(s"__newts_$n",
          when(col(lrn) =!= 1 &&
            ts.cast("long") - lag(ts.cast("long"), 1).over(localW) > idle, ts))
      case CumSumOf(n, e, Some(r)) =>
        // local prefix sum, and the local prefix sum as of just BEFORE the most
        // recent local restart (a restart row resets before adding itself)
        sorted = sorted
          .withColumn(s"__ls_$n", sum(e).over(localCumW))
          .withColumn(s"__lb_$n",
            last(when(r, col(s"__ls_$n") - e), ignoreNulls = true).over(localCumW))
      case _ => ()
    }

    // 3a. per-partition stats (deterministic: value extremes keyed by local row
    // number, not by `first`/`last` aggregate order)
    // ordered values of e within the partition (by local row number), as an
    // array bounded to the first/last `k` elements — the cross-boundary carry
    // for offset-k prev/next
    def orderedVals(e: Column): Column =
      transform(array_sort(collect_list(struct(col(lrn).as("i"), e.as("v")))),
        s => s.getField("v"))
    def lastK(arr: Column, k: Int): Column =
      slice(arr, greatest(size(arr) - k + 1, lit(1)), lit(k))
    val statAggs = Seq(count(lit(1)).as("__cnt")) ++ fns.flatMap {
      case CumSumOf(n, e, restart) =>
        sum(e).as(s"__psum_$n") +: (if (restart.isEmpty) Nil else Seq(
          // local B at the partition's END (null if this partition never restarts)
          max_by(col(s"__lb_$n"),
            when(col(s"__lb_$n").isNotNull, col(lrn))).as(s"__plb_$n")))
      case PrevOf(n, e, k, _) => Seq(lastK(orderedVals(e), k).as(s"__ptail_$n"))
      case NextOf(n, e, k, _) => Seq(slice(orderedVals(e), 1, k).as(s"__phead_$n"))
      case RankDense(n, e) => Seq(
        sum(col(s"__chg_$n")).as(s"__pchg_$n"),
        min_by(e, col(lrn)).as(s"__rdfirst_$n"),
        max_by(e, col(lrn)).as(s"__rdlast_$n"))
      case RankMin(n, e) => Seq(
        max(when(col(s"__chg_$n") === 1, col(lrn))).as(s"__lastchg_$n"),
        min_by(e, col(lrn)).as(s"__rmfirst_$n"),
        max_by(e, col(lrn)).as(s"__rmlast_$n"))
      case WindowSession(n, ts, _, _) => Seq(
        max_by(col(s"__newts_$n"),
          when(col(s"__newts_$n").isNotNull, col(lrn))).as(s"__pnew_$n"),
        min_by(ts, col(lrn)).as(s"__wsfirst_$n"),
        max_by(ts, col(lrn)).as(s"__wslast_$n"))
      case RowNumber(_) => Nil
    }
    val stats = sorted.groupBy(col(pid)).agg(statAggs.head, statAggs.tail: _*)

    // 3b. first broadcast self-join: neighbours' carried values + row offsets
    val a = stats.alias("a")
    val b = stats.alias("b")
    def lt(c: Column) = when(col(s"b.$pid") < col(s"a.$pid"), c)
    def gt(c: Column) = when(col(s"b.$pid") > col(s"a.$pid"), c)
    // neighbours' carried arrays: per-partition tails (heads) concatenated in
    // pid order, re-bounded to k — the true last-k/first-k values across any
    // run of small partitions
    def catSorted(piece: Column): Column =
      flatten(transform(array_sort(collect_list(piece)), s => s.getField("t")))
    val join1Aggs = Seq(
      coalesce(sum(lt(col("b.__cnt"))), lit(0L)).as("__rowoff"),
      max(lt(col(s"b.$pid"))).isNotNull.as("__haspred")) ++ fns.flatMap {
      case CumSumOf(n, _, _) => Seq(sum(lt(col(s"b.__psum_$n"))).as(s"__cumoff_$n"))
      case PrevOf(n, _, k, _) => Seq(
        lastK(catSorted(lt(struct(col(s"b.$pid").as("p"), col(s"b.__ptail_$n").as("t")))), k)
          .as(s"__prevtail_$n"))
      case NextOf(n, _, k, _) => Seq(
        slice(catSorted(gt(struct(col(s"b.$pid").as("p"), col(s"b.__phead_$n").as("t")))), 1, k)
          .as(s"__nexthead_$n"))
      case RankDense(n, _) => Seq(
        max_by(lt(col(s"b.__rdlast_$n")), lt(col(s"b.$pid"))).as(s"__rdprevlast_$n"))
      case RankMin(n, _) => Seq(
        max_by(lt(col(s"b.__rmlast_$n")), lt(col(s"b.$pid"))).as(s"__rmprevlast_$n"))
      case WindowSession(n, _, _, _) => Seq(
        max_by(lt(col(s"b.__wslast_$n")), lt(col(s"b.$pid"))).as(s"__wsprevlast_$n"))
      case RowNumber(_) => Nil
    }
    val aCols = stats.columns.map(c => col(s"a.$c").as(c))
    val statsB = a.join(broadcast(b), col(s"b.$pid") =!= col(s"a.$pid"), "left_outer")
      .groupBy(aCols.toIndexedSeq: _*).agg(join1Aggs.head, join1Aggs.tail: _*)

    // per-partition boundary indicators that need the neighbour values
    var statsC = statsB
    fns.foreach {
      case RankDense(n, _) =>
        // is this partition's FIRST row a value change? (global first row: yes)
        statsC = statsC.withColumn(s"__rdbound_$n",
          when(!col("__haspred"), lit(1L))
            .otherwise((!(col(s"__rdfirst_$n") <=> col(s"__rdprevlast_$n"))).cast("long")))
      case RankMin(n, _) =>
        statsC = statsC.withColumn(s"__rmbound_$n",
          when(!col("__haspred"), lit(1L))
            .otherwise((!(col(s"__rmfirst_$n") <=> col(s"__rmprevlast_$n"))).cast("long")))
      case WindowSession(n, _, idleSec, _) =>
        // does this partition's FIRST row start a new session?
        statsC = statsC.withColumn(s"__wsbound_$n",
          when(!col("__haspred"), lit(true))
            .otherwise(col(s"__wsfirst_$n").cast("long") -
              col(s"__wsprevlast_$n").cast("long") > idleSec))
        // latest session start visible at the END of this partition, if any
        statsC = statsC.withColumn(s"__efflast_$n",
          coalesce(col(s"__pnew_$n"), when(col(s"__wsbound_$n"), col(s"__wsfirst_$n"))))
      case _ => ()
    }

    // 3c. second broadcast self-join for offsets that depend on every earlier
    // partition's OWN boundary status (rank-change totals, carried session start)
    val needSecond = fns.exists {
      case _: RankDense | _: RankMin | _: WindowSession => true
      case CumSumOf(_, _, Some(_)) => true
      case _ => false }
    val offsets = if (!needSecond) statsC else {
      val a2 = statsC.alias("a")
      val b2 = statsC.alias("b")
      def lt2(c: Column) = when(col(s"b.$pid") < col(s"a.$pid"), c)
      val join2Aggs = fns.flatMap {
        case RankDense(n, _) => Seq(coalesce(
          sum(lt2(coalesce(col(s"b.__pchg_$n"), lit(0L)) + col(s"b.__rdbound_$n"))),
          lit(0L)).as(s"__chgoff_$n"))
        case RankMin(n, _) => Seq(
          // latest change GLOBAL position among predecessors: positions grow
          // with pid, so a plain max over the non-null contributions suffices
          max(lt2(col(s"b.__rowoff") + coalesce(col(s"b.__lastchg_$n"),
            when(col(s"b.__rmbound_$n") === 1, lit(1L))))).as(s"__prevrank_$n"))
        case WindowSession(n, _, _, _) => Seq(
          max_by(lt2(col(s"b.__efflast_$n")),
            when(col(s"b.$pid") < col(s"a.$pid") && col(s"b.__efflast_$n").isNotNull,
              col(s"b.$pid"))).as(s"__prevsess_$n"))
        case CumSumOf(n, _, Some(_)) => Seq(
          // global B carried from the LATEST predecessor partition containing a
          // restart: its local anchor plus its own prefix-sum offset
          max_by(lt2(col(s"b.__plb_$n") + coalesce(col(s"b.__cumoff_$n"), lit(0L))),
            when(col(s"b.$pid") < col(s"a.$pid") && col(s"b.__plb_$n").isNotNull,
              col(s"b.$pid"))).as(s"__carryb_$n"))
        case _ => Nil
      }
      val aCols2 = statsC.columns.map(c => col(s"a.$c").as(c))
      a2.join(broadcast(b2), col(s"b.$pid") =!= col(s"a.$pid"), "left_outer")
        .groupBy(aCols2.toIndexedSeq: _*).agg(join2Aggs.head, join2Aggs.tail: _*)
    }

    // 4. combine local windows with the broadcast offsets
    var out = sorted.join(broadcast(offsets), Seq(pid))
    fns.foreach {
      case RowNumber(n) =>
        out = out.withColumn(n, (col("__rowoff") + col(lrn)).cast("int"))
      case PrevOf(n, e, k, dflt) =>
        // row L wants global position (rowoff + L) - k: in-partition when L > k,
        // else tail element size - (k - L); before the table start → default
        val tail = col(s"__prevtail_$n")
        val idx = (size(tail) - (lit(k) - col(lrn))).cast("int")
        out = out.withColumn(n,
          when(col(lrn) > k, lag(e, k).over(localW))
            .otherwise(when(idx >= 1, element_at(tail, idx))
              .otherwise(dflt.getOrElse(lit(null)))))
      case NextOf(n, e, k, dflt) =>
        val head = col(s"__nexthead_$n")
        val idx = (col(lrn) + lit(k) - col("__cnt")).cast("int")
        out = out.withColumn(n,
          when(col(lrn) + lit(k) <= col("__cnt"), lead(e, k).over(localW))
            .otherwise(when(idx <= size(head), element_at(head, idx))
              .otherwise(dflt.getOrElse(lit(null)))))
      case CumSumOf(n, e, restart) =>
        val globalS = coalesce(col(s"__cumoff_$n"), lit(0L)) + sum(e).over(localCumW)
        out = restart match {
          case None => out.withColumn(n, globalS)
          case Some(_) =>
            // subtract the global prefix sum as of just before the most recent
            // restart: local anchor if this partition restarted, else the carry
            val localB = coalesce(col(s"__cumoff_$n"), lit(0L)) + col(s"__lb_$n")
            out.withColumn(n,
              globalS - coalesce(localB, col(s"__carryb_$n"), lit(0L)))
        }
      case RankDense(n, _) =>
        out = out.withColumn(n,
          col(s"__chgoff_$n") + col(s"__rdbound_$n") +
            coalesce(sum(col(s"__chg_$n")).over(localCumW), lit(0L)))
      case RankMin(n, _) =>
        // global row number of the current run's first row: the latest change
        // in this partition, else this partition's (changed) first row, else
        // the latest change carried from predecessors
        out = out.withColumn(n, coalesce(
          col("__rowoff") +
            last(when(col(s"__chg_$n") === 1, col(lrn)), ignoreNulls = true).over(localCumW),
          when(col(s"__rmbound_$n") === 1, col("__rowoff") + 1),
          col(s"__prevrank_$n")))
      case WindowSession(n, _, _, _) =>
        out = out.withColumn(n,
          coalesce(last(col(s"__newts_$n"), ignoreNulls = true).over(localCumW),
            when(col(s"__wsbound_$n"), col(s"__wsfirst_$n")),
            col(s"__prevsess_$n")))
    }
    // maxDuration refinement: restart chains are per-idle-session folds over
    // that session's rows IN SERIALIZED ORDER (Kusto walks rows, not sorted
    // values — they differ when ts is non-monotonic inside a session, e.g. at a
    // `sort by user, ts` user boundary where ts jumps backward). Thread the
    // global row number through as the fold/join key. The refinement reads
    // its input THREE times (restart fold, row mapping, final join) —
    // Caching.materialize so the range-partition + offset-join pipeline above
    // is computed once, not three times, through the bounded registry (a
    // bare Dataset.persist leaked a CacheManager entry per distinct plan).
    val needsRefine = fns.exists {
      case WindowSession(_, _, _, Some(_)) => true; case _ => false
    }
    val grn = "__mds_grn"
    if (needsRefine) out = out.withColumn(grn, col("__rowoff") + col(lrn))
    val keep = df.columns ++ fns.map(_.name) ++ (if (needsRefine) Seq(grn) else Nil)
    val selected = out.select(keep.map(col).toIndexedSeq: _*)
    val base =
      if (needsRefine) graft.functions.Caching.materialize(selected)
      else selected
    val refined = fns.foldLeft(base) {
      case (acc, WindowSession(n, ts, _, Some(maxDur))) =>
        refineSessionMaxDuration(acc, n, ts, maxDur, grn)
      case (acc, _) => acc
    }
    if (needsRefine) refined.drop(grn) else refined
  }

  /** Split idle-gap sessions further at KQL `row_window_session` maxDuration
    * boundaries: walking the session's rows in SERIALIZED order, a new window
    * starts at the first row whose ts is more than `maxDurSec` past the current
    * window's start — a sequential chain, but one that only reads that
    * session's rows. Computed distributively: fold each session's rows (sorted
    * by the global row number `rn`, i.e. the serialized order — NOT by ts
    * value, which diverges from Kusto's row walk when ts is non-monotonic
    * inside a session) down to its restart points (output = restarts only, tiny
    * even for a degenerate all-one-session corpus), then each row takes the
    * restart with the greatest row number ≤ its own. Kusto never restarts on a
    * backward ts jump (ts - start < 0 is not > maxDur), and neither does this. */
  private def refineSessionMaxDuration(df: DataFrame, n: String, ts: Column,
                                       maxDurSec: Long, rn: String): DataFrame = {
    val maxDurUs = maxDurSec * 1000000L
    val restarts = df.groupBy(col(n).as("__mds_sess"))
      .agg(array_sort(collect_list(struct(col(rn).as("i"), unix_micros(ts).as("t"))))
        .as("__mds_rows"))
      .select(col("__mds_sess"), explode(aggregate(
        col("__mds_rows"),
        struct(lit(null).cast("long").as("cur"),
          array().cast("array<struct<i:bigint,t:bigint>>").as("st")),
        (acc, r) => {
          val cur = acc.getField("cur")
          val isNew = cur.isNull || (r.getField("t") - cur) > maxDurUs
          struct(when(isNew, r.getField("t")).otherwise(cur).as("cur"),
            when(isNew, concat(acc.getField("st"), array(r)))
              .otherwise(acc.getField("st")).as("st"))
        },
        acc => acc.getField("st"))).as("__mds_restart"))
    // restart with the greatest row number ≤ each row's own; restart lists are
    // short (one entry per maxDuration rollover) so the theta-join stays small
    val mapping = df.select(col(n).as("__mds_sess"), col(rn).as("__mds_i"))
      .join(restarts.withColumnRenamed("__mds_sess", "__mds_sess2"),
        col("__mds_sess") === col("__mds_sess2") &&
          col("__mds_restart").getField("i") <= col("__mds_i"))
      .groupBy(col("__mds_i"))
      .agg(timestamp_micros(max(col("__mds_restart")).getField("t")).as("__mds_start"))
    df.join(mapping, df(rn) === mapping("__mds_i"), "left")
      .withColumn(n, coalesce(col("__mds_start"), df(n)))
      .drop("__mds_i", "__mds_start")
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
