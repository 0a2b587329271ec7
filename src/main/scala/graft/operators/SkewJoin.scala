package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted join for skewed keys: when one join key carries a large share
 * of the rows (hot user, null-bucket, celebrity entity), a plain
 * shuffle join sends that key's whole partition to one task. Salting
 * splits the hot side's rows across `salt` sub-keys and replicates the
 * other side `salt` times — the classic manual skew mitigation, useful
 * when AQE's skew-join split can't apply (e.g., non-sort-merge plans,
 * aggregations after the join, or deterministic-partitioning needs).
 *
 * Cost model: the replicated side grows ×salt, so use it with the
 * SMALLER side as `other`. For broadcast-sized `other`, prefer
 * `broadcast()` — salting is for the middle ground where neither side
 * broadcasts and AQE can't help.
 */
object SkewJoin {

  /**
   * Inner-join `skewed` with `other` on `key`, distributing each key of
   * `skewed` over `salt` shuffle partitions.
   */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    // deterministic salt from a stable row attribute set (all columns),
    // so repeated runs produce identical partitioning
    val saltedLeft = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salt)).cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop(replicatedRight(key))
      .drop("__salt")
  }
}
