package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** HDR-histogram quantile sketch (Tene's HdrHistogram bucketing; the
  * deterministic member of the quantile-sketch family next to GK/KLL/
  * t-digest): a non-negative integer value keeps only its top 5
  * significant bits — exponent from the binary-string length, sub-bucket
  * from a shift — so every bucket's width is ≤ 1/16 of its lower bound
  * and any rank query is answered within 6.25% relative error from a
  * DOMAIN-BOUNDED count table (≤ 16 + 16·59 buckets over the full long
  * range).
  *
  * Why this sketch completes the family: counts are exact longs and the
  * bucket function is pure integer arithmetic, so partials merge by
  * ADDITION — the sketch is mergeable, partition-order INVARIANT, and
  * bit-identical across engines (no randomness, no float boundary, no
  * merge-order dependence — the properties GK/KLL/t-digest each give
  * up). That makes its gate face hash-checkable, where every other
  * quantile sketch would be rows-only.
  *
  * Scale shape: ONE map-side-combining shuffle onto ≤ ~1000 bucket keys;
  * the rank extraction windows over the bounded bucket table (never the
  * data). The single-partition window is over ≤ 1000 rows by
  * construction — the q_pareto concern does not apply.
  */
object HdrSketch {

  /** Bucket lower bound: zero all but the top 5 significant bits.
    * Exact integer arithmetic on both engines (binary-string length +
    * shifts); values < 32 are their own bucket (exact small-value
    * regime). Domain: v ≥ 0.
    */
  def rep(v: Column): Column = {
    val sh = length(bin(v)) - lit(5)
    when(v < 32, v).otherwise(
      call_function("shiftleft", call_function("shiftright", v, sh), sh))
  }

  /** The mirrored DuckDB bucket expression for oracle SQL. */
  def repSql(v: String): String =
    s"""CASE WHEN $v < 32 THEN $v
        ELSE ($v >> (length(bin($v)) - 5)) << (length(bin($v)) - 5) END"""

  /** One-row quantile summary: n, n_buckets, and for each (num, den,
    * name) the bucket lower bound at rank ceil(num·n/den) — which
    * PROVABLY equals rep(exact quantile): every bucket below the true
    * quantile's accumulates fewer than rank values (HdrSketchSpec
    * asserts the identity against sorted exact quantiles).
    */
  def quantiles(values: DataFrame, valueCol: String,
      ps: Seq[(Int, Int, String)]): DataFrame = {
    val b = values.select(rep(col(valueCol)).as("rep"))
      .groupBy(col("rep")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("rep"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.select(col("rep"), sum(col("cnt")).over(w).as("cum"))
    val tot = b.agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_buckets"))
    val aggs = Seq(first(col("n")).as("n"),
      first(col("n_buckets")).as("n_buckets")) ++
      ps.map { case (num, den, name) =>
        // rank = ceil(num·n/den) as exact integer arithmetic
        min(when(col("cum") >= call_function("div",
          lit(num.toLong) * col("n") + lit((den - 1).toLong), lit(den.toLong)),
          col("rep"))).as(name)
      }
    cum.crossJoin(broadcast(tot)).agg(aggs.head, aggs.tail: _*)
  }

  /** The sketch as a single partial aggregate — the form a STREAMING
    * window needs (one agg per query): buffer = bucket→count map
    * (≤ ~1000 entries whatever the group size), merge = map-wise add
    * (exact longs — merge-order invariant, so stream ≡ batch
    * bit-identically), finish = rank extraction over the sorted
    * buckets. Output: [n, est(p₁), est(p₂), …].
    */
  final class HdrQuantileAggregator(ps: Seq[(Int, Int)])
      extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
    private def bucket(v: Long): Long =
      if (v < 32) v else {
        val sh = 63 - java.lang.Long.numberOfLeadingZeros(v) - 4
        (v >> sh) << sh
      }

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(buf: Map[Long, Long], v: Long): Map[Long, Long] = {
      val b = bucket(v)
      buf.updated(b, buf.getOrElse(b, 0L) + 1L)
    }

    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }

    override def finish(buf: Map[Long, Long]): Seq[Long] = {
      val n = buf.valuesIterator.sum
      val sorted = buf.toArray.sortBy(_._1)
      n +: ps.map { case (num, den) =>
        val rank = (num.toLong * n + den - 1) / den
        var cum = 0L
        var est = -1L
        var i = 0
        while (i < sorted.length && est < 0) {
          cum += sorted(i)._2
          if (cum >= rank) est = sorted(i)._1
          i += 1
        }
        est
      }
    }

    override def bufferEncoder = ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[Long]]()
  }

  /** The aggregator as a column function. */
  def quantileAgg(ps: Seq[(Int, Int)]): Column => Column = {
    val f = udaf(new HdrQuantileAggregator(ps), ExpressionEncoder[Long]())
    v => f(v)
  }
}
