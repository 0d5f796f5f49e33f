package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch contracts: exact below k, bounded error above it,
  * order/partitioning invariance (mergeability is exercised by Spark's
  * own partial aggregation — the sketch of a repartitioned input must
  * not change), and agreement with the exact overlap on a corpus whose
  * true Jaccard is planted.
  */
class KmvSpec extends SparkSpec {

  private val k = 256

  test("below k the sketch is the exact set and estimates are exact") {
    import spark.implicits._
    // 100 distinct values < k=256: the sketch holds every hash
    val df = (1 to 300).map(i => ("g", s"v${i % 100}")).toDF("g", "w")
    val sk = Kmv.sketchPerGroup(df, "g", "w", k)
    val row = sk.select(size(col("sketch")),
      Kmv.estimateDistinct(col("sketch"), k)).head
    assert(row.getInt(0) === 100)
    assert(row.getDouble(1) === 100.0)
    // self-combine: union = the set itself, jaccard exactly 1
    val c = sk.select(Kmv.combine(col("sketch"), col("sketch"), k).as("e"))
      .select(col("e.est_union"), col("e.est_jaccard")).head
    assert(c.getDouble(0) === 100.0 && c.getDouble(1) === 1.0)
  }

  test("cardinality estimate lands within 3 standard errors at 20x k") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => ("g", s"tok$i")).toDF("g", "w")
    val est = Kmv.sketchPerGroup(df, "g", "w", k)
      .select(Kmv.estimateDistinct(col("sketch"), k)).head.getDouble(0)
    // KMV relative std error ≈ 1/sqrt(k-2) ≈ 6.3%
    assert(math.abs(est - n) < 3 * n / math.sqrt(k - 2.0), s"est=$est")
  }

  test("planted 0.2 Jaccard estimated within 3 standard errors") {
    import spark.implicits._
    // A = 0..2999, B = 2000..4999: |A∩B| = 1000, |A∪B| = 5000, J = 0.2
    val rows = (0 until 3000).map(i => ("a", s"t$i")) ++
      (2000 until 5000).map(i => ("b", s"t$i"))
    val sk = Kmv.sketchPerGroup(rows.toDF("g", "w"), "g", "w", k)
      .localCheckpoint()
    val a = sk.filter(col("g") === "a").select(col("sketch").as("ska"))
    val b = sk.filter(col("g") === "b").select(col("sketch").as("skb"))
    val e = a.crossJoin(b)
      .select(Kmv.combine(col("ska"), col("skb"), k).as("e"))
      .select(col("e.est_jaccard"), col("e.est_union"), col("e.est_shared"))
      .head
    val (j, u, s) = (e.getDouble(0), e.getDouble(1), e.getDouble(2))
    val se = math.sqrt(0.2 * 0.8 / k)
    assert(math.abs(j - 0.2) < 3 * se, s"jaccard=$j")
    assert(math.abs(u - 5000) < 3 * 5000 / math.sqrt(k - 2.0), s"union=$u")
    assert(math.abs(s - 1000) < 1000 * 0.45, s"shared=$s")
  }

  test("sketch is partitioning- and order-invariant (merge correctness)") {
    import spark.implicits._
    val rows = new scala.util.Random(7).shuffle(
      (1 to 4000).map(i => ("g", s"w${i % 1700}")).toList)
    val one = Kmv.sketchPerGroup(rows.toDF("g", "w").coalesce(1), "g", "w", k)
      .select("sketch").head.getSeq[Long](0)
    val many = Kmv.sketchPerGroup(rows.toDF("g", "w").repartition(13), "g", "w", k)
      .select("sketch").head.getSeq[Long](0)
    assert(one === many)
    assert(one.length === k)
    assert(one === one.sorted, "sketch must be ascending")
  }

  test("the KMV overlap face tracks the exact face on the documents table") {
    val dir = sf()
    val exact = graft.queries.Pipeline.pVocabOverlap(spark, dir)
      .select(col("source_a"), col("source_b"), col("jaccard"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val est = graft.queries.Pipeline.pVocabOverlapKmv(spark, dir)
      .select(col("source_a"), col("source_b"), col("est_jaccard"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(est.keySet === exact.keySet)
    val tol = 4 * math.sqrt(0.25 / k) // J(1-J) ≤ 1/4
    exact.foreach { case (pair, j) =>
      assert(math.abs(est(pair) - j) <= tol, s"$pair exact=$j est=${est(pair)}")
    }
  }
}
