package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-set sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007) — the mergeable sketch for DISTINCT-SET
  * INTERSECTION, the operation HLL cannot answer: keep the k smallest
  * distinct hash values of a set; the k-th smallest estimates density
  * ((k−1)/u_k ≈ cardinality), and two sketches COMBINE (k smallest of
  * the union's sketch values) into an unbiased Jaccard estimator
  * (matching fraction among the union's k minima). At 100 TB this is
  * how cross-source vocabulary/entity overlap matrices are computed:
  * one sketch per source in one pass (k·8 bytes each, mergeable like
  * any partial aggregate — the same contract as the CMS/Misra-Gries/
  * HLL family), then the |sources|² combine runs over kilobyte arrays
  * instead of a token-keyed join of the full vocabularies.
  *
  * Hash order: values are stored SIGN-FLIPPED (`xxhash64 XOR
  * Long.MinValue`) so ascending signed order — the order `array_sort`
  * and the buffer use — equals unsigned order of the raw hash, and the
  * uniform-[0,1) map is `(raw >>> 11) / 2^53` off the unflipped value.
  * Below k distinct values the sketch IS the exact set (estimates
  * degrade to exact counts — spec'd).
  */
object Kmv {

  /** k smallest DISTINCT (sign-flipped) hash values, ascending. The
    * buffer is a sorted Vector: k is small by contract (hundreds), so
    * O(k) insertion beats heap constant factors, exactly as TopK.
    */
  final class KmvAggregator(k: Int) extends Aggregator[Long, Vector[Long], Seq[Long]] {
    override def zero: Vector[Long] = Vector.empty

    override def reduce(buf: Vector[Long], f: Long): Vector[Long] = {
      if (buf.size == k && f >= buf.last) buf
      else {
        val i = java.util.Arrays.binarySearch(buf.toArray, f)
        if (i >= 0) buf // already present: KMV is a DISTINCT sketch
        else buf.patch(-i - 1, Seq(f), 0).take(k)
      }
    }

    override def merge(b1: Vector[Long], b2: Vector[Long]): Vector[Long] =
      b2.foldLeft(b1)(reduce)

    override def finish(buf: Vector[Long]): Seq[Long] = buf

    override def bufferEncoder = ExpressionEncoder[Vector[Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[Long]]()
  }

  /** The aggregator as a column function over a sign-flipped hash. */
  def kmvAgg(k: Int): Column => Column = {
    val f = udaf(new KmvAggregator(k), ExpressionEncoder[Long]())
    h => f(h)
  }

  /** One KMV sketch per group over `valueCol` (hashed internally):
    * (groupCol, sketch array<long> ascending-flipped, n_seen distinct
    * cap k). One partial-merged aggregation — map-side buffers are
    * k-bounded, so the exchange carries ≤ k·8 bytes per (group, map
    * partition) regardless of group size.
    */
  def sketchPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k > 1, "k must be > 1")
    df.select(col(groupCol),
        xxhash64(col(valueCol)).bitwiseXOR(lit(Long.MinValue)).as("__f"))
      .groupBy(col(groupCol))
      .agg(kmvAgg(k)(col("__f")).as("sketch"))
  }

  /** Uniform-[0,1) of a FLIPPED sketch value (unflip, top 53 bits). */
  private def unif(f: Column): Column =
    shiftrightunsigned(f.bitwiseXOR(lit(Long.MinValue)), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Distinct-cardinality estimate of one sketch column: exact size
    * when the sketch never filled, else (k−1)/u_k.
    */
  def estimateDistinct(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1.0) / unif(element_at(sketch, k)))

  /** Pairwise combine of two sketch columns into
    * (est_union, est_shared, est_jaccard) struct: the union sketch is
    * the k smallest of the merged value sets; Jaccard is the fraction
    * of those minima present in BOTH inputs. The higher-order
    * filter/aggregate here runs over k-element arrays on a
    * |groups|²-row table — kilobytes, not a data-scale path (the
    * data-scale work ended at the partial-aggregated sketches).
    */
  def combine(a: Column, b: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(a, b)), 1, k)
    val kU = size(merged)
    val matches = size(filter(merged,
      x => array_contains(a, x) && array_contains(b, x)))
    val estUnion = when(kU < k, kU.cast("double"))
      .otherwise(lit(k - 1.0) / unif(element_at(merged, kU)))
    val j = matches.cast("double") / kU
    struct(round(estUnion, 2).as("est_union"),
      round(j * estUnion, 2).as("est_shared"),
      round(j, 4).as("est_jaccard"))
  }
}
