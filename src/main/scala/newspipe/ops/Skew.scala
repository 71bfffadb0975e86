package newspipe.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the manual salting fallback for when AQE's
  * runtime skew-join split isn't available (non-shuffle-join shapes, or a
  * hot key known in advance).
  *
  * `saltedEquiJoin(left, right, keys, n)`: the (large, skewed) left side
  * gets a deterministic per-row salt in [0, n); the (smaller) right side is
  * replicated n× with every salt value. Joining on (keys :+ salt) splits
  * each hot key's rows across n reducers instead of one. Result is
  * row-identical to the plain equi-join (verified in SkewSpec) at the cost
  * of an n× blow-up of the right side — use when right ≪ left and a key is
  * hot enough to stall a reducer.
  *
  * Supported join types: inner and the left-flavored joins (left/left_outer,
  * left_semi, left_anti). Right/full joins are rejected: the right side is
  * replicated saltBuckets×, so every UNMATCHED right row would surface once
  * per salt — not row-identical to the plain join.
  */
object Skew {

  // "semi"/"anti" are Spark's accepted aliases for leftsemi/leftanti
  // (JoinType.apply normalizes them) — row-identical-safe under right-side
  // replication, so allowed here too
  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(SupportedJoinTypes(joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")),
      s"saltedEquiJoin supports inner/left/left_semi/left_anti joins only " +
        s"(got '$joinType'): the replicated right side would emit unmatched " +
        s"right rows $saltBuckets times under right/full joins")
    // deterministic salt: spreads rows of one key uniformly without an RNG
    // (rand() would break retry/replay determinism at scale)
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
