package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HDR quantile sketch: the rank extraction must equal rep(exact
  * quantile) EXACTLY (not just within the error bound — buckets below
  * the true quantile's cannot accumulate the rank), the bound
  * rep(v) ≤ v < rep(v)·17/16 + 1 must hold pointwise, and the bucket
  * table must be partition-order invariant (exact integer counts).
  */
class HdrSketchSpec extends SparkSpec {

  private val PS = Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))

  private def sketch(vals: Seq[Long], parts: Int): (Long, Long, Map[String, Long]) = {
    import spark.implicits._
    val df = vals.toDF("v").repartition(parts)
    val r = HdrSketch.quantiles(df, "v", PS).collect()(0)
    (r.getLong(0), r.getLong(1),
      PS.map(_._3).zipWithIndex.map { case (n, i) => n -> r.getLong(i + 2) }.toMap)
  }

  private def exactQuantile(sorted: Vector[Long], num: Long, den: Long): Long = {
    val r = ((num * sorted.size + den - 1) / den).toInt // ceil rank, 1-based
    sorted(math.max(r, 1) - 1)
  }

  private def repRef(v: Long): Long =
    if (v < 32) v else {
      val sh = 63 - java.lang.Long.numberOfLeadingZeros(v) - 4
      (v >> sh) << sh
    }

  test("estimate == rep(exact quantile) on randomized heavy-tailed data") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 3) {
      val vals = Seq.fill(2000)(math.abs(rnd.nextLong()) %
        (if (trial == 1) 100L else if (trial == 2) 100000L else 1000000000L))
      val sorted = vals.sorted.toVector
      val (n, _, q) = sketch(vals, 8)
      assert(n == vals.size)
      for ((num, den, name) <- PS) {
        val v = exactQuantile(sorted, num, den)
        assert(q(name) == repRef(v), s"$name trial $trial")
        assert(q(name) <= v && v <= q(name) + math.max(1L, q(name) / 16), s"$name bound")
      }
    }
  }

  test("small-value regime is exact") {
    val vals = Seq.tabulate(500)(i => (i % 31).toLong)
    val sorted = vals.sorted.toVector
    val (_, _, q) = sketch(vals, 4)
    for ((num, den, name) <- PS)
      assert(q(name) == exactQuantile(sorted, num, den), name)
  }

  test("partition-order invariance: identical output across layouts") {
    val rnd = new scala.util.Random(17)
    val vals = Seq.fill(3000)(math.abs(rnd.nextLong()) % 10000000L)
    val a = sketch(vals, 1)
    val b = sketch(vals, 7)
    val c = sketch(vals, 32)
    assert(a == b && b == c)
  }

  test("bucket table is domain-bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = Seq.fill(5000)(math.abs(rnd.nextLong())).toDF("v")
    val nBuckets = df.select(HdrSketch.rep(col("v")).as("r")).distinct().count()
    assert(nBuckets <= 16 + 16 * 60) // exact smalls + 16 sub-buckets/exponent
  }
}
