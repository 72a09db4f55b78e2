package graft.kql

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KQL `scan` operator — sequence (funnel) matching as a state machine over
  * ordered rows. The reference declares the KQL tabular surface
  * (/root/reference/README.md:33-34); `scan` is its sequence-detection operator.
  *
  * Restricted semantics (documented deviations from full Kusto `scan`):
  *   - the match partition key is EXPLICIT (`keys`) instead of implied by the
  *     serialized order — the common Kusto idiom `sort by user, ts | scan ...`
  *     maps to `keys=user, order=ts`;
  *   - one active sequence per key at a time (no `declare` state variables, no
  *     concurrent per-step matches): a row that satisfies the NEXT step's
  *     predicate advances the sequence; otherwise a row satisfying step 1
  *     restarts a new sequence; other rows pass through unmatched. Reaching the
  *     last step completes the match and resets to idle.
  *
  * Output: only participating rows (Kusto `output=all`), each with
  * `match_step` (1-based step index this row matched) and `match_seq` (1-based
  * per-key sequence id). `completedOnly=true` keeps only sequences that reached
  * the final step.
  *
  * Scale posture: step predicates are evaluated as ONE codegen'd projection
  * BEFORE the shuffle (only k booleans ride the exchange); then one
  * repartition on `keys` + in-partition sort, and a streaming per-partition
  * iterator with O(1) state — no per-key collect, no driver state, works for a
  * key with a billion rows. The RDD bridge breaks whole-stage codegen exactly
  * at this operator's boundary, which is inherent: a sequential state machine
  * is the one shape Catalyst cannot express relationally.
  */
object Scan {

  def scanSequence(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   steps: Seq[(String, Column)],
                   completedOnly: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "scan requires at least one step")
    require(keys.nonEmpty, "scan requires an explicit match key")
    val n = df.columns.length
    val k = steps.size
    val flags = steps.zipWithIndex.map { case ((_, c), i) =>
      c.cast("boolean").as(s"__scan_m$i")
    }
    val pre = df
      .select(df.columns.map(col).toIndexedSeq ++ flags: _*)
      .repartition(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col) ++ order: _*)
    val keyIdx = keys.map(df.columns.indexOf(_))
    val schema = StructType(df.schema.fields :+
      StructField("match_step", IntegerType, nullable = false) :+
      StructField("match_seq", LongType, nullable = false))
    val out = pre.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var step = 0 // 0 = idle, else the step the active sequence last matched
      var seq = 0L
      it.flatMap { r =>
        val kv = keyIdx.map(r.get)
        if (kv != curKey) { curKey = kv; step = 0; seq = 0L }
        def m(i: Int): Boolean = !r.isNullAt(n + i) && r.getBoolean(n + i)
        val advanced = step < k && m(step) // predicate of step `step+1`
        if (advanced || m(0)) {
          if (advanced && step > 0) step += 1
          else { seq += 1; step = 1 } // fresh start or restart at step 1
          val emitted = Row.fromSeq(r.toSeq.take(n) :+ step :+ seq)
          if (step == k) step = 0 // completed: reset to idle
          Some(emitted)
        } else None
      }
    }
    val scanned = df.sparkSession.createDataFrame(out, schema)
    if (!completedOnly) scanned
    else {
      val w = Window.partitionBy(keys.map(col) :+ col("match_seq"): _*)
      scanned.withColumn("__scan_max", max(col("match_step")).over(w))
        .filter(col("__scan_max") === k).drop("__scan_max")
    }
  }

  /** Kusto-faithful `scan`: ONE state machine over the global serialized order,
    * no partition key — a sequence may span any rows (Kusto constrains it to an
    * entity via `declare` state; without declare, this global walk IS the
    * documented semantics).
    *
    * A sequential global fold would be a single-task non-starter at 100 TB; but
    * the machine's state space is FINITE (idle + steps 1..k-1; reaching k resets
    * to idle), so the fold is distributed exactly like the serialized row
    * functions (Kql.serializedRowFns): range-partition by the serialized order,
    * then
    *   pass 1: each partition folds its rows ONCE for ALL k possible incoming
    *           states simultaneously, yielding a k-entry transition summary
    *           (outgoing state + sequences started, per incoming state);
    *   compose: the #partitions × k summary table — the only driver-side
    *           data, a bounded model like the IVF centroids — is prefix-composed
    *           into each partition's actual incoming state and match-id offset;
    *   pass 2: each partition re-folds from its known incoming state and emits
    *           participating rows with globally-numbered match ids.
    * The input is persisted across the two passes so the range layout is
    * computed once and both folds stream the same cached partitions. */
  def scanSerialized(df: DataFrame, order: Seq[Column],
                     steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "scan requires at least one step")
    val n = df.columns.length
    val k = steps.size
    val flags = steps.zipWithIndex.map { case ((_, c), i) =>
      c.cast("boolean").as(s"__scan_m$i")
    }
    val pre = df
      .select(df.columns.map(col).toIndexedSeq ++ flags: _*)
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val rdd = pre.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def matches(r: Row, i: Int): Boolean = !r.isNullAt(n + i) && r.getBoolean(n + i)
    /** One machine step: (state, row) → (state', emittedStep, startedNew). */
    def advance(s: Int, r: Row): (Int, Int, Boolean) = {
      val adv = s < k && matches(r, s)
      if (adv || matches(r, 0)) {
        val emitted = if (adv && s > 0) s + 1 else 1
        val next = if (emitted == k) 0 else emitted
        (next, emitted, emitted == 1)
      } else (s, 0, false)
    }

    // pass 1: per-partition transition table for every possible incoming state
    val summaries = rdd.mapPartitionsWithIndex { (pid, it) =>
      val outSt = Array.tabulate(k)(identity)
      val started = new Array[Long](k)
      it.foreach { r =>
        var s0 = 0
        while (s0 < k) {
          val (next, _, fresh) = advance(outSt(s0), r)
          outSt(s0) = next
          if (fresh) started(s0) += 1
          s0 += 1
        }
      }
      Iterator.single((pid, outSt, started))
    }.collect().sortBy(_._1)

    // compose: actual incoming state + match-id offset per partition
    val incoming = new Array[(Int, Long)](summaries.length)
    var st = 0
    var total = 0L
    summaries.foreach { case (pid, outSt, started) =>
      incoming(pid) = (st, total)
      total += started(st)
      st = outSt(st)
    }
    val bc = df.sparkSession.sparkContext.broadcast(incoming)

    // pass 2: re-fold from the known incoming state, emit participating rows
    val schema = StructType(df.schema.fields :+
      StructField("match_step", IntegerType, nullable = false) :+
      StructField("match_id", LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var (s, seq) = if (pid < bc.value.length) bc.value(pid) else (0, 0L)
      it.flatMap { r =>
        val (next, emitted, fresh) = advance(s, r)
        s = next
        if (fresh) seq += 1
        if (emitted > 0) Some(Row.fromSeq(r.toSeq.take(n) :+ emitted :+ seq))
        else None
      }
    }
    // Materialize pass 2 now (participating rows only — typically a small
    // fraction of the input) so the full-width input cache can be released
    // immediately; otherwise every scan in a long-lived session leaks its
    // persisted partitions until the RDD is GC'd.
    val result = df.sparkSession.createDataFrame(out, schema).localCheckpoint()
    rdd.unpersist(blocking = false)
    result
  }
}
