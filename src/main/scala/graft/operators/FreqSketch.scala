package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters sketch as a typed partial-merge
  * `Aggregator` — the frequency member of the repo's mergeable-sketch
  * family (HLL++ distinct profile, TopKAggregator ranking). One narrow
  * pass; every map task keeps at most `capacity` counters, partials
  * merge associatively (Agarwal et al., "Mergeable Summaries", PODS
  * 2012), and only k-bounded state ever crosses the wire — the
  * single-pass answer to "which items dominate 100 TB" when the item
  * domain is too large to count exactly.
  *
  * Guarantees (classic): reported counts are LOWER bounds
  * undercounting by at most N/(capacity+1), and every item with true
  * frequency above N/(capacity+1) is guaranteed present. When the
  * distinct-item domain fits `capacity`, no eviction ever fires and
  * the sketch degenerates to EXACT counts — the regime the driver
  * query runs in (hash-checkable against a plain GROUP BY), while
  * FreqSketchSpec exercises the eviction regime and its bound.
  *
  * Usable unchanged as a Structured Streaming aggregation — typed
  * aggregators partial-merge per micro-batch like any agg
  * (FreqSketchSpec asserts stream == batch in complete mode).
  */
object FreqSketch {

  final class MisraGriesAggregator(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1L)
        case None if buf.size < capacity => buf.updated(item, 1L)
        case None =>
          // the MG step: decrement every counter (the new item's own
          // 1 − 1 = 0 keeps it out), drop exhausted counters
          buf.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }
      }

    /** Mergeable-summaries merge: sum counters, then if over capacity
      * subtract the (capacity+1)-th largest count from everything and
      * keep the strictly-positive survivors — the error stays within
      * the summed N/(capacity+1) bounds of the inputs.
      */
    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val summed = b2.foldLeft(b1) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (summed.size <= capacity) summed
      else {
        val thresh = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        summed.flatMap { case (k, v) =>
          if (v - thresh > 0L) Some(k -> (v - thresh)) else None
        }
      }
    }

    /** Deterministic output order: count desc, then item asc. */
    override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
      buf.toSeq.sortBy { case (k, v) => (-v, k) }

    override def bufferEncoder = ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Heavy hitters of `itemCol`: (item, est_count), est_count the MG
    * lower bound (exact when the distinct domain fits `capacity`).
    */
  def heavyHitters(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val f = udaf(new MisraGriesAggregator(capacity), Encoders.STRING)
    df.agg(f(col(itemCol)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("item"), col("e._2").as("est_count"))
  }
}
