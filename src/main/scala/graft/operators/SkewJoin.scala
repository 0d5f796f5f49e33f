package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join sends every row of a hot key to one reducer; with a
  * few keys carrying most of the volume (power-law web data at 100 TB),
  * one straggler task dominates the stage. Salting rewrites the join:
  * the skewed (large) side scatters each key across `saltFactor`
  * sub-keys; the other side replicates each row `saltFactor` times (one
  * per sub-key). Same result set, hot keys now spread over saltFactor
  * reducers, at the cost of replicating the small side — choose
  * saltFactor ≈ hot-key rows / target-partition rows.
  *
  * AQE's skew-join handling covers sort-merge joins automatically;
  * this operator is for the cases AQE cannot split (aggregations after
  * the join keyed the same way, or deliberately pre-salted layouts).
  */
object SkewJoin {

  /** Inner equi-join of `skewed` (large, hot-keyed) with `other` on
    * `keys`. Output columns = skewed's ++ other's non-key columns.
    */
  def salted(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic per-row scatter: hash the full row, not rand() —
    // retries/speculative tasks must salt identically
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toSeq: _*)), lit(saltFactor)))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1L))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
