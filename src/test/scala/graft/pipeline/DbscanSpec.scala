package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Cluster.dbscanFromPairs]]: the density semantics plain CC lacks
  * (bridges don't fuse, stragglers are noise), deterministic border
  * attachment, and a randomized cross-check against a driver-side
  * reference DBSCAN.
  */
class DbscanSpec extends SparkSpec {

  private def run(pairs: Seq[(Long, Long)], n: Long, minPts: Int)
      : Map[Long, (String, Option[Long])] = {
    import spark.implicits._
    val nodes = (1L to n).toDF("id")
    Cluster.dbscanFromPairs(nodes, pairs.toDF("id_a", "id_b"), minPts)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
  }

  /** Driver reference: same deterministic semantics, independent code. */
  private def reference(pairs: Seq[(Long, Long)], n: Long, minPts: Int)
      : Map[Long, (String, Option[Long])] = {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val core = (1L to n).filter(v => adj(v).size >= minPts).toSet
    // CC over core-core edges, min-label to fixpoint
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    core.foreach(v => comp(v) = v)
    var changed = true
    while (changed) {
      changed = false
      for (v <- core; u <- adj(v) if core(u) && comp(u) < comp(v)) {
        comp(v) = comp(u); changed = true
      }
    }
    (1L to n).map { v =>
      if (core(v)) v -> ("core", Some(comp(v)))
      else {
        val coreNbr = adj(v).filter(core)
        if (coreNbr.nonEmpty) v -> ("border", Some(coreNbr.map(comp).min))
        else v -> ("noise", None)
      }
    }.toMap
  }

  test("a sparse bridge through a non-core node does NOT fuse dense blobs; plain CC fuses them") {
    // blob A: 1-2-3-4 complete; blob B: 5-6-7-8 complete; bridge
    // 4-11-5 through node 11 (degree 2 < minPts — never core, so
    // density-connectivity cannot pass through it)
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val pairs = k4a ++ k4b ++ Seq((4L, 11L), (11L, 5L)) ++
      Seq((9L, 10L)) // 9-10: stragglers
    val got = run(pairs, 11L, minPts = 3)
    assert((1L to 8L).forall(got(_)._1 == "core"))
    val clusterA = got(1L)._2.get
    val clusterB = got(5L)._2.get
    assert(clusterA != clusterB,
      "bridge fused the blobs — density semantics lost")
    assert(got(4L)._2.get === clusterA && got(8L)._2.get === clusterB)
    // the bridge node is border of the min-id cluster among {A, B}
    assert(got(11L)._1 === "border")
    assert(got(11L)._2.get === math.min(clusterA, clusterB))
    // the 9-10 pair: degree 1 each — noise, not a singleton cluster
    assert(got(9L) === ("noise", None) && got(10L) === ("noise", None))
    // contrast: plain CC over the same pairs puts 1..8 in ONE component
    import spark.implicits._
    val cc = graft.graph.Algorithms.connectedComponents(
        (1L to 11L).toDF("gid"), pairs.toDF("gsrc", "gdst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === cc(8L), "sanity: plain CC must fuse through the bridge")
  }

  test("border points attach to the min-id cluster among core neighbors") {
    // two triangles-with-hub cores sharing border node 100
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val pairs = k4a ++ k4b ++ Seq((1L, 100L), (5L, 100L))
    val got = run(pairs, 100L, minPts = 3)
    assert(got(100L)._1 === "border")
    assert(got(100L)._2 === got(1L)._2, "border must take the MIN cluster id")
    // isolated nodes (11..99) are all noise
    assert((11L to 99L).forall(got(_) == ("noise", None)))
  }

  private def runIncr(basePairs: Seq[(Long, Long)],
      newPairs: Seq[(Long, Long)], n: Long, minPts: Int)
      : Map[Long, (String, Option[Long])] = {
    import spark.implicits._
    val nodes = (1L to n).toDF("id")
    val (und, deg, labels) =
      Cluster.dbscanFit(basePairs.toDF("id_a", "id_b"), minPts)
    Cluster.dbscanIncremental(nodes, und, deg, labels,
        newPairs.toDF("id_a", "id_b"), minPts)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
  }

  test("planted core promotion: a base pair becomes a core-core edge and merges clusters") {
    // base: K4 {1-4} and a chain 4-9, 9-10 (9 has base degree 2 — NOT
    // core) plus K4 {5-8} with 8-9; batch adds 9-11, promoting 9 to
    // core: base pairs (4,9) and (8,9) become core-core edges and the
    // two K4 clusters MERGE through 9
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val basePairs = k4a ++ k4b ++ Seq((4L, 9L), (8L, 9L))
    val newPairs = Seq((9L, 11L))
    val got = runIncr(basePairs, newPairs, 11L, minPts = 3)
    val want = run(basePairs ++ newPairs, 11L, minPts = 3)
    assert(got === want)
    assert(got(9L)._1 === "core", "batch pair must promote node 9")
    assert(got(1L)._2 === got(5L)._2, "promotion must merge the two K4 clusters")
    // and before the batch they were separate
    val before = run(basePairs, 11L, minPts = 3)
    assert(before(1L)._2 !== before(5L)._2)
  }

  test("incremental fold ≡ full refit on random node splits") {
    val rnd = new scala.util.Random(2718L)
    for (trial <- 0 until 4) {
      val n = 36L
      val pairs = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.10
      } yield (a, b)).toSeq
      val isBatch = (v: Long) => v % 5 == 0
      val basePairs = pairs.filter { case (a, b) => !isBatch(a) && !isBatch(b) }
      val newPairs = pairs.filter { case (a, b) => isBatch(a) || isBatch(b) }
      for (minPts <- Seq(2, 3)) {
        val got = runIncr(basePairs, newPairs, n, minPts)
        val want = run(pairs, n, minPts)
        assert(got === want, s"trial=$trial minPts=$minPts")
      }
    }
  }

  test("chained folds ≡ one fold ≡ full refit across arrival waves") {
    // points arrive in three waves; each unordered pair belongs to the
    // wave of its LATER-arriving endpoint (the streaming face's arrived
    // filter), so the chained state folds see exactly the per-trigger
    // pair streams s_dbscan_incr feeds them
    import spark.implicits._
    val rnd = new scala.util.Random(3141L)
    for (trial <- 0 until 3) {
      val n = 36L
      val pairs = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.10
      } yield (a, b)).toSeq
      val wave = (v: Long) => if (v % 5 != 0) 0 else 1 + ((v / 5) % 3).toInt
      val basePairs = pairs.filter { case (a, b) => wave(a) == 0 && wave(b) == 0 }
      val byWave = (1 to 3).map { w =>
        pairs.filter { case (a, b) =>
          math.max(wave(a), wave(b)) == w }
      }
      for (minPts <- Seq(2, 3)) {
        var st = Cluster.dbscanFit(basePairs.toDF("id_a", "id_b"), minPts)
        for (wp <- byWave)
          st = Cluster.dbscanFold(st._1, st._2, st._3,
            wp.toDF("id_a", "id_b"), minPts)
        val got = Cluster.dbscanAssign((1L to n).toDF("id"), st._1, st._3)
          .collect()
          .map(r => r.getLong(0) ->
            (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
          .toMap
        val oneFold = runIncr(basePairs, byWave.flatten, n, minPts)
        val want = run(pairs, n, minPts)
        assert(got === want, s"chained != refit: trial=$trial minPts=$minPts")
        assert(oneFold === want, s"one-fold != refit: trial=$trial minPts=$minPts")
      }
    }
  }

  test("r13 fold internals: batch-only endpoints exercise the anti-leg of the decomposed degree fold; singleton new cores") {
    import spark.implicits._
    // base: star at 5 (5-6, 5-7, 5-8) → 5 is core (minPts 3), leaves
    // are borders. Batch: a star at 1 over NODES ABSENT FROM baseDeg
    // (1,2,3,4) — their degrees flow exclusively through the bump
    // anti-join leg introduced in r13 — plus 4-5 touching base state.
    // 1 becomes core with no core neighbor → singleton cluster 1.
    val st0 = Cluster.dbscanFit(
      Seq((5L, 6L), (5L, 7L), (5L, 8L)).toDF("id_a", "id_b"), minPts = 3)
    val st1 = Cluster.dbscanFold(st0._1, st0._2, st0._3,
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)).toDF("id_a", "id_b"),
      minPts = 3)
    val got = Cluster.dbscanAssign((1L to 10L).toDF("id"), st1._1, st1._3)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    val want = reference(
      Seq((5L, 6L), (5L, 7L), (5L, 8L), (1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)),
      10L, 3)
    assert(got === want)
    // and the fold's degree table matches a from-scratch fit's exactly
    val refitDeg = Cluster.dbscanFit(
      Seq((5L, 6L), (5L, 7L), (5L, 8L), (1L, 2L), (1L, 3L), (1L, 4L),
        (4L, 5L)).toDF("id_a", "id_b"), minPts = 3)._2
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val foldDeg = st1._2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(foldDeg === refitDeg)
  }

  test("randomized graphs ≡ driver reference across minPts") {
    val rnd = new scala.util.Random(8150L)
    for (trial <- 0 until 4) {
      val n = 40L
      val pairs = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.08
      } yield (a, b)).toSeq
      for (minPts <- Seq(2, 3, 5)) {
        val got = run(pairs, n, minPts)
        val want = reference(pairs, n, minPts)
        assert(got === want, s"trial=$trial minPts=$minPts")
      }
    }
  }
}
