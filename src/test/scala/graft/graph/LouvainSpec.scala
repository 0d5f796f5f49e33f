package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Louvain community detection: planted-structure recovery, determinism,
  * modularity dominance over label propagation on the real co-purchase
  * graph, and the contraction level's no-regression guarantee.
  */
class LouvainSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], levels: Int = 2): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("gsrc", "gdst")
    val n = e.select(col("gsrc").as("gid"))
      .unionByName(e.select(col("gdst").as("gid"))).distinct()
    Algorithms.louvain(n, e, levels = levels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))

  /** Driver-side Newman modularity of a partition (unit weights). */
  private def modularity(edges: Seq[(Long, Long)], comm: Map[Long, Long]): Double = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val m = und.size.toDouble
    val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toDouble }
    val intra = und.count(e => comm(e._1) == comm(e._2)) / m
    val degSq = deg.groupBy { case (v, _) => comm(v) }
      .map { case (_, vs) => math.pow(vs.values.sum / (2 * m), 2) }.sum
    intra - degSq
  }

  test("two cliques joined by a bridge resolve to the two cliques") {
    val edges = clique(1L to 6L) ++ clique(11L to 16L) :+ ((6L, 11L))
    val got = run(edges)
    assert((1L to 6L).map(got).toSet.size == 1)
    assert((11L to 16L).map(got).toSet.size == 1)
    assert(got(1L) != got(11L))
  }

  test("ring of four 5-cliques recovers the four cliques") {
    val cliques = Seq(1L to 5L, 11L to 15L, 21L to 25L, 31L to 35L)
    val edges = cliques.flatMap(c => clique(c)) ++
      Seq((5L, 11L), (15L, 21L), (25L, 31L), (35L, 1L))
    val got = run(edges)
    for (c <- cliques)
      assert(c.map(got).toSet.size == 1, s"clique $c split: ${c.map(got)}")
    assert(cliques.map(c => got(c.head)).distinct.size == 4)
  }

  test("deterministic: identical assignment across runs") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    assert(run(edges) == run(edges))
  }

  test("beats label propagation's modularity on the real co-purchase graph") {
    val li = graft.Tables.load(spark, sf(), "lineitem")
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
    val edgesDf = perOrder.select(explode(expr(
        """flatten(transform(ps, (x, i) ->
           transform(slice(ps, i + 2, size(ps)), y -> struct(x AS gsrc, y AS gdst))))"""))
        .as("e"))
      .select(col("e.gsrc").as("gsrc"), col("e.gdst").as("gdst")).distinct()
    val nodes = edgesDf.select(col("gsrc").as("gid"))
      .unionByName(edgesDf.select(col("gdst").as("gid"))).distinct()
    val edges = edgesDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lv = Algorithms.louvain(nodes, edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lp = Algorithms.labelPropagation(nodes, edgesDf, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qLv = modularity(edges, lv)
    val qLp = modularity(edges, lp)
    assert(qLv > 0.0, s"louvain modularity $qLv not positive")
    assert(qLv >= qLp, s"louvain $qLv < label-prop $qLp")
  }

  test("the contraction level never loses modularity vs one level") {
    val rnd = new scala.util.Random(11)
    // chain of 8 small triangles with sparse bridges — fragments at
    // level 1 that contraction can merge
    val edges = (0 until 8).flatMap { i =>
      val base = i * 10L
      clique(Seq(base + 1, base + 2, base + 3))
    } ++ (0 until 7).map(i => (i * 10L + 3, (i + 1) * 10L + 1)) ++
      Seq.fill(20)((rnd.nextInt(80).toLong + 1, rnd.nextInt(80).toLong + 1))
        .filter(e => e._1 != e._2)
    val valid = edges.filter { case (a, b) =>
      Seq(a, b).forall(v => v % 10 >= 1 && v % 10 <= 3 && v / 10 < 8)
    }
    val q1 = modularity(valid, run(valid, levels = 1))
    val q2 = modularity(valid, run(valid, levels = 2))
    assert(q2 >= q1 - 1e-12, s"level-2 $q2 < level-1 $q1")
  }
}
