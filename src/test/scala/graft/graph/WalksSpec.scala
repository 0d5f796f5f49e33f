package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WalksSpec extends SparkSpec {

  test("every hop follows an edge, isolated seeds stay, full length otherwise") {
    import spark.implicits._
    // path graph 1-2-3-4 plus isolated node 9
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("gid")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("gsrc", "gdst")
    val got = Walks.randomWalks(nodes, edges, steps = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 9L))
    assert(got(9L) === "9") // no neighbors, path never grows
    val undirected = Set((1L, 2L), (2L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Set((a, b), (b, a)) }
    got.filter(_._1 != 9L).foreach { case (id, path) =>
      val hops = path.split("->").map(_.toLong).toSeq
      assert(hops.head === id)
      assert(hops.size === 4, s"walk $id: $path") // steps+1 nodes
      hops.zip(hops.tail).foreach(h => assert(undirected.contains(h), s"$path"))
    }
  }

  test("walks are a pure function of the graph — layout-independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = (1 to 60).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2).toDF("gsrc", "gdst")
    val nodes = (0L until 20L).toDF("gid")
    val a = Walks.randomWalks(nodes, edges, steps = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Walks.randomWalks(nodes.repartition(7), edges.repartition(5, col("gsrc")), steps = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("the AdjGraph faces equal the raw-edge faces (canonicalized und is the same graph)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // include a duplicate and a reversed duplicate: the AdjGraph path
    // dedups via least/greatest+distinct, the raw path keeps multiplicity
    // — the md5-argmin / A-ES-argmax picks are multiplicity-invariant,
    // so both faces must emit identical paths
    val base = (1 to 50).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2)
    val edges = (base ++ base.take(5) ++ base.take(3).map(_.swap))
      .toDF("gsrc", "gdst")
    val nodes = (0L until 15L).toDF("gid")
    val adj = Algorithms.prepareAdjacency(edges)
    val u1 = Walks.randomWalks(nodes, edges, steps = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val u2 = Walks.randomWalks(adj, nodes, steps = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(u1 === u2)
    val n1 = Walks.node2vecWalks(nodes, edges, steps = 3, p = 4.0, q = 0.25)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n2 = Walks.node2vecWalks(adj, nodes, steps = 3, p = 4.0, q = 0.25)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(n1 === n2)
  }

  test("node2vec walks match a driver-side simulation of the p/q rule") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rawEdges = (1 to 60)
      .map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2)
    val nodes = (0L until 15L)
    val (p, q, steps) = (4.0, 0.25, 4)
    val got = Walks.node2vecWalks(nodes.toDF("gid"),
        rawEdges.toDF("gsrc", "gdst"), steps, p, q)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // driver simulation of the identical deterministic rule
    val und = rawEdges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    def uniform(walkId: Long, step: Int, b: Long): Double = {
      val h = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$walkId:$step:$b").substring(0, 13)
      java.lang.Long.parseLong(h, 16).toDouble / 4503599627370496.0
    }
    val sim = nodes.map { s =>
      var prev = Option.empty[Long]
      var cur = s
      val path = new StringBuilder(s.toString)
      for (step <- 1 to steps) {
        val cands = adj.getOrElse(cur, Seq.empty)
        if (cands.nonEmpty) {
          val pick = cands.map { b =>
            val alpha =
              if (prev.contains(b)) 1.0 / p
              else if (prev.exists(pv => und(pv -> b))) 1.0
              else 1.0 / q
            val key = BigDecimal(math.pow(uniform(s, step, b), 1.0 / alpha))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
            (key, b)
          }.max
          prev = Some(cur)
          cur = pick._2
          path.append("->").append(pick._2)
        }
      }
      s -> path.toString
    }.toMap
    assert(got === sim)
  }

  test("md5 choice spreads across neighbors rather than collapsing to one") {
    import spark.implicits._
    // 200 leaves each connected to hubs 1000-1003: first hops should
    // spread over all four hubs (deterministic given the fixed keys)
    val leaves = (1L to 200L)
    val edges = leaves.flatMap(l => (1000L to 1003L).map(h => (l, h)))
      .toDF("gsrc", "gdst")
    val firstHop = Walks.randomWalks(leaves.toDF("gid"), edges, steps = 1)
      .collect().map(_.getString(1).split("->")(1).toLong)
    val byHub = firstHop.groupBy(identity).view.mapValues(_.length).toMap
    assert(byHub.keySet === (1000L to 1003L).toSet)
    byHub.values.foreach(n => assert(n >= 20, s"skewed hub choice: $byHub"))
  }
}
