package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  test("heavyExact is bit-equal to GROUP BY HAVING, including under collisions") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 3 heavy items, a mid item exactly at threshold-1, and noise
    val items = rnd.shuffle(
      Seq.fill(300)("alpha") ++ Seq.fill(150)("beta") ++ Seq.fill(100)("gamma") ++
        Seq.fill(99)("edge") ++ (1 to 500).map(i => s"noise$i"))
    val df = items.toDF("item").repartition(7)
    val got = CountMin.heavyExact(df, "item", threshold = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 100L).toMap
    assert(got === truth)
    // a width of 2 forces constant collisions: false positives enter the
    // candidate set, but the exact second pass must still remove them
    val collided = CountMin.heavyExact(df, "item", threshold = 100L,
        depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(collided === truth)
  }

  test("estimates upper-bound true counts and are exact sans collision") {
    import spark.implicits._
    val items = (Seq.fill(40)("x") ++ Seq.fill(25)("y") ++ Seq.fill(3)("z"))
    val df = items.toDF("item")
    val sk = CountMin.sketch(df, "item", depth = 4, width = 4096)
    val probes = Seq("x", "y", "z", "absent").toDF("item")
    val est = CountMin.estimate(sk, probes, "item", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("x" -> 40L, "y" -> 25L, "z" -> 3L, "absent" -> 0L)
    // CMS never under-counts…
    truth.foreach { case (k, c) => assert(est(k) >= c, k) }
    // …and with 3 distinct items in a 4096-wide row, collisions are
    // absent at this planted size, so the estimates are exact
    assert(est === truth)
  }

  test("joinSizeEstimate upper-bounds the exact join size, tightly at sane widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // zipf-ish key frequencies on both sides — the case that matters:
    // a uniform-assumption optimizer underestimates skewed joins badly
    def side(n: Int, seed: Int): Seq[Long] = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)((math.pow(r.nextDouble(), 3) * 50).toLong)
    }
    val a = side(4000, 1); val b = side(3000, 2)
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = fa.map { case (k, c) => c * fb.getOrElse(k, 0L) }.sum
    val est = CountMin.joinSizeEstimate(
      a.toDF("k").repartition(5), "k", b.toDF("k").repartition(3), "k")
      .collect()(0).getLong(0)
    assert(est >= exact, s"CMS inner product under-counted: $est < $exact")
    // expected collision mass ≤ (e/width)·Na·Nb ≈ 4000·3000·e/8192 ≈ 4000;
    // allow 3× the expectation for the min over 4 rows
    assert(est <= exact + 3L * 4000L, s"estimate too loose: $est vs $exact")
    // degenerate width forces collisions; the bound must still hold
    val loose = CountMin.joinSizeEstimate(
      a.toDF("k"), "k", b.toDF("k"), "k", depth = 2, width = 4)
      .collect()(0).getLong(0)
    assert(loose >= exact)
    val _ = rnd
  }

  test("joinSizeEstimate of disjoint key domains is 0, not NULL") {
    import spark.implicits._
    // wide sketch → no cross-domain bucket collisions: every depth row
    // has zero overlapping buckets and must still contribute its zero
    val a = (1 to 50).map(i => s"left_$i").toDF("k")
    val b = (1 to 50).map(i => s"right_$i").toDF("k")
    val row = CountMin.joinSizeEstimate(a, "k", b, "k", width = 65536)
      .collect()(0)
    assert(!row.isNullAt(0), "disjoint-domain estimate came back NULL")
    assert(row.getLong(0) === 0L)
  }

  test("sketch is layout-invariant and bounded by the bucket space") {
    import spark.implicits._
    val items = (1 to 5000).map(i => s"t${i % 97}").toDF("item")
    val a = CountMin.sketch(items.repartition(13), "item", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = CountMin.sketch(items.coalesce(1), "item", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // partial-merge mergeability: any partitioning yields the same table
    assert(a === b)
    assert(a.size <= 4 * 64)
    // each depth row conserves the total item count
    (0 until 4).foreach { i =>
      assert(a.collect { case ((d, _), c) if d == i => c }.sum === 5000L)
    }
  }

  test("the sketch shuffle is bucket-bounded: partial agg before the exchange") {
    val items = spark.range(10000).selectExpr("concat('w', id % 211) AS item")
    val plan = CountMin.sketch(items, "item", depth = 4, width = 128)
      .queryExecution.executedPlan.toString
    // map-side combine: a partial HashAggregate must sit below the
    // exchange so only bucket-space rows cross the wire
    assert(plan.contains("partial_count"), plan.take(2000))
  }
}
