package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for the joins AQE cannot rebalance.
  *
  * Spark's AQE skew-join splits oversized SORT-MERGE partitions at runtime
  * and is the first line of defense — it needs no code. Salting is for the
  * residual cases: a shuffled HASH join whose hot key must not land in one
  * task's hash map, stateful/streaming joins where AQE does not apply, or a
  * skewed key feeding a downstream stateful operator. The pattern: the BIG
  * side sprays each row into one of `salts` sub-keys (the salt is derived
  * from a row id, so rows of one hot key spread uniformly; its value never
  * affects the result), the other side replicates once per salt value, and
  * the join key becomes (key, salt) — the hot key's work now spreads over
  * `salts` tasks. For the supported join types (inner/cross and the
  * left-oriented family, where unmatched OTHER-side rows are never emitted)
  * the result set is EXACTLY the plain join's: each big-side row matches
  * precisely the one replica carrying its salt (oracle-checked by
  * q_salted_join against the plain SQL join). Right/full outer joins are
  * rejected: every unmatched replica of the `other` side would surface
  * `salts` times — flip the sides (salt the other input) instead.
  *
  * Cost model at 100 TB: the replicated side pays ×salts shuffle volume —
  * use for moderate dimension tables (too big to broadcast, small enough to
  * replicate) and keep `salts` near the cluster's per-key parallelism gap
  * (8–64), not in the hundreds. */
object Skew {

  /** Join types whose output never contains an unmatched `other`-side row —
    * the ones for which salting is result-identical to the plain join. */
  private val SupportedJoinTypes = Set(
    "inner", "cross", "left", "leftouter", "left_outer",
    "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")

  def saltedJoin(big: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "saltedJoin: salts must be >= 1")
    require(keys.nonEmpty, "saltedJoin: join keys required")
    val jt = joinType.toLowerCase.replace(" ", "")
    require(SupportedJoinTypes.contains(jt),
      s"saltedJoin: joinType '$joinType' would emit unmatched replicated " +
        "rows of the salted dimension; use inner/left/semi/anti/cross, or " +
        "swap the inputs so the preserved side is the big one")
    // A user column named like the internal salt would be silently
    // overwritten and then dropped — refuse rather than corrupt.
    val saltCol = "__graft_salt"
    require(!big.columns.contains(saltCol) && !other.columns.contains(saltCol),
      s"saltedJoin: inputs must not contain a '$saltCol' column")
    val salted = big.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val expanded = other.withColumn(saltCol,
      explode(array((0 until salts).map(lit): _*)))
    salted.join(expanded, keys :+ saltCol, joinType).drop(saltCol)
  }
}
