package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact ntile — the scale swap for the single-partition
  * `ntile(n).over(Window.orderBy(...))` bucket windows (q_pareto /
  * q_rfm). A totally-ordered ntile window forces every row through ONE
  * partition; this operator computes the bit-identical bucket with no
  * unpartitioned window at all:
  *
  *   1. `repartitionByRange` on the total order (the distributed sort —
  *      partition i's keys all precede partition i+1's) +
  *      `sortWithinPartitions`, so partition-iteration order IS the
  *      global order;
  *   2. `monotonically_increasing_id` then encodes (partitionId << 33)
  *      + local index, giving each row its local rank without any
  *      window (and without a second exchange — the id is narrow);
  *   3. per-partition counts (a partition-count-bounded aggregate) turn
  *      into rank offsets via a triangle self-join over that tiny
  *      table — window-free, broadcast back;
  *   4. the exact ntile bucket is pure arithmetic on the global rank:
  *      with N rows and n buckets, the first N mod n buckets hold
  *      ⌈N/n⌉ rows and the rest ⌊N/n⌋ — exactly Spark's (and every
  *      SQL engine's) NTILE contract.
  *
  * Requires a TOTAL order (include a unique tiebreak column): range
  * boundaries may fall anywhere, and the result is boundary-invariant
  * only because no two rows compare equal. `NtileSpec` pins
  * bit-equality to the window formulation on randomized data
  * (N mod n ≠ 0, N < n, duplicate sort values with unique tiebreaks).
  */
object Ntile {

  /** df + an `out` LongType column holding ntile(n) under `order`.
    *
    * Internal column names are `_nt_`-prefixed; the input must not use
    * that prefix. Output column order: input columns, then `out`.
    */
  def distributed(df: DataFrame, n: Int, order: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val inputCols = df.columns.toSeq
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // sorted-order ids: materialize once (two consumers: counts + rows)
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_nt_mid", monotonically_increasing_id())
      .localCheckpoint()
    val base = ranged
      .withColumn("_nt_pid", shiftrightunsigned(col("_nt_mid"), 33))
      .withColumn("_nt_lrn", col("_nt_mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
    val counts = base.groupBy(col("_nt_pid")).agg(count(lit(1)).as("_nt_pc"))
    val prior = counts.select(col("_nt_pid").as("_nt_cpid"),
      col("_nt_pc").as("_nt_cpc"))
    // offset(p) = Σ counts of partitions before p; N rides in the same
    // broadcastable table (both partition-count-bounded)
    val offsets = counts
      .join(prior, col("_nt_cpid") < col("_nt_pid"), "left")
      .groupBy(col("_nt_pid"))
      .agg(coalesce(sum(col("_nt_cpc")), lit(0L)).as("_nt_off"))
    val total = counts.agg(sum(col("_nt_pc")).as("_nt_n"))
    base
      .join(broadcast(offsets), Seq("_nt_pid"))
      .crossJoin(broadcast(total))
      .withColumn("_nt_grn", col("_nt_off") + col("_nt_lrn"))
      .withColumn("_nt_q", expr(s"_nt_n DIV $n"))
      .withColumn("_nt_rem", col("_nt_n") % n)
      .withColumn("_nt_big", col("_nt_rem") * (col("_nt_q") + 1))
      .withColumn(out,
        when(col("_nt_grn") <= col("_nt_big"),
          expr("(_nt_grn - 1) DIV (_nt_q + 1) + 1"))
          .otherwise(expr("_nt_rem + (_nt_grn - _nt_big - 1) DIV _nt_q + 1")))
      .select((inputCols.map(col) :+ col(out)): _*)
  }
}
