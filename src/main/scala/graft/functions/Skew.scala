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
  * `salts` tasks. Result set is EXACTLY the plain join's: each big-side row
  * matches precisely the one replica carrying its salt (oracle-checked by
  * q_salted_join against the plain SQL join).
  *
  * Cost model at 100 TB: the replicated side pays ×salts shuffle volume —
  * use for moderate dimension tables (too big to broadcast, small enough to
  * replicate) and keep `salts` near the cluster's per-key parallelism gap
  * (8–64), not in the hundreds. */
object Skew {

  def saltedJoin(big: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "saltedJoin: salts must be >= 1")
    require(keys.nonEmpty, "saltedJoin: join keys required")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val expanded = other.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(expanded, keys :+ "__salt", joinType).drop("__salt")
  }
}
