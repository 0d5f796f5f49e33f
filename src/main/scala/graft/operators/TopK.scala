package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per group as a PARTIAL AGGREGATE instead of a window sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v)` shuffles every row of
  * every group and sorts each partition before discarding all but k rows
  * (WindowGroupLimit prunes some of that, but the shuffle still carries
  * a partial top-k per input partition and the reducer still sorts).
  * An Aggregator keeps a k-bounded buffer per group per map task, so the
  * exchange carries at most k entries per (group, map partition) and no
  * sort ever sees the full group — the shape that wins when groups are
  * large and k is small (the heavy-hitter report over 100 TB of events).
  * The result is deterministic — order by (value desc, id asc) with the
  * id tiebreak — so it hash-matches the window formulation, which is
  * exactly what the DuckDB oracle runs.
  *
  * The buffer is a sorted Vector (k is small by contract; insertion is
  * O(k) — a binary heap only pays off past k ≈ 100s).
  */
object TopK {

  /** (value, id) ordering: larger value first, then smaller id.
    * `Double.compare` instead of primitive `>` so NaN ranks ABOVE every
    * double — matching Spark's `desc` sort order, which the window
    * formulation this aggregate hash-matches relies on (primitive
    * comparisons are all-false on NaN and would silently drop such
    * rows). Zeros are normalized first: `Double.compare(-0.0, 0.0)` is
    * negative, but Spark sorts treat the two as equal.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val cmp = java.lang.Double.compare(
      if (a._1 == 0.0d) 0.0d else a._1,
      if (b._1 == 0.0d) 0.0d else b._1)
    cmp > 0 || (cmp == 0 && a._2 < b._2)
  }

  final class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), Vector[(Double, Long)], Seq[(Double, Long)]] {
    override def zero: Vector[(Double, Long)] = Vector.empty

    override def reduce(buf: Vector[(Double, Long)],
        a: (Double, Long)): Vector[(Double, Long)] = {
      if (buf.size == k && !better(a, buf.last)) buf
      else {
        val i = buf.indexWhere(e => better(a, e)) match {
          case -1 => buf.size
          case n => n
        }
        (buf.patch(i, Seq(a), 0)).take(k)
      }
    }

    override def merge(b1: Vector[(Double, Long)],
        b2: Vector[(Double, Long)]): Vector[(Double, Long)] =
      b2.foldLeft(b1)(reduce)

    override def finish(buf: Vector[(Double, Long)]): Seq[(Double, Long)] = buf

    override def bufferEncoder = ExpressionEncoder[Vector[(Double, Long)]]()
    override def outputEncoder = ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** The aggregator as a two-argument column function. */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
    (v, id) => f(v, id)
  }

  /** Top-k rows per group: returns (groupCol, rank, id, value) — the
    * aggregated array exploded back to rows, rank 1-based in (value
    * desc, id asc) order.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.groupBy(col(groupCol))
      .agg(topK(k)(col(valueCol).cast("double"), col(idCol).cast("long")).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__i", "__e")))
      .select(col(groupCol), (col("__i") + 1).cast("long").as("rank"),
        col("__e._2").as(idCol), col("__e._1").as(valueCol))
  }
}
