package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temporal earliest-arrival reachability: the distributed relaxation
  * must equal the DEFINITION (min last-edge time over time-respecting
  * paths), checked against a driver-side fixpoint on planted and
  * randomized temporal graphs. The planted cases pin the two semantics
  * that distinguish temporal from static reachability: a hop-shorter
  * path can lose to a time-feasible longer one, and a node can be
  * statically reachable yet temporally UNREACHABLE (edge into it runs
  * backward in time).
  */
class TemporalReachSpec extends SparkSpec {

  private val T0 = 0L // seed arrival sentinel (seconds since epoch)

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("a", "b", "tsec")
      .select(col("a"), col("b"), timestamp_seconds(col("tsec")).as("t"))
    val s = seeds.toDF("gid")
    Algorithms.temporalEarliestArrival(e, s, timestamp_seconds(lit(T0)))
      .select(col("gid"), unix_timestamp(col("arr")).as("sec"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver reference: relax (u,v,t) with t >= arr(u) until fixpoint. */
  private def reference(edges: Seq[(Long, Long, Long)], seeds: Seq[Long]): Map[Long, Long] = {
    val arr = scala.collection.mutable.Map(seeds.map(_ -> T0): _*)
    var changed = true
    while (changed) {
      changed = false
      for ((u, v, t) <- edges if u != v)
        if (arr.get(u).exists(t >= _) && arr.get(v).forall(t < _)) {
          arr(v) = t; changed = true
        }
    }
    arr.toMap
  }

  test("planted: time-feasible long path beats time-infeasible shortcut") {
    // 1→2(t5)→3(t6) arrives at 6; the direct 1→3(t10) only at 10
    val edges = Seq[(Long, Long, Long)]((1, 2, 5), (2, 3, 6), (1, 3, 10))
    assert(run(edges, Seq(1L)) == Map(1L -> T0, 2L -> 5L, 3L -> 6L))
  }

  test("planted: statically reachable but temporally blocked") {
    // 1→4 at t3, 4→5 at t2 < 3: node 5 never becomes reachable
    val edges = Seq[(Long, Long, Long)]((1, 4, 3), (4, 5, 2))
    assert(run(edges, Seq(1L)) == Map(1L -> T0, 4L -> 3L))
  }

  test("planted: a later parallel edge re-opens a blocked continuation") {
    // 1→4 at t3; 4→5 exists at t2 (blocked) AND t7 (open) → arr(5)=7
    val edges = Seq[(Long, Long, Long)]((1, 4, 3), (4, 5, 2), (4, 5, 7))
    assert(run(edges, Seq(1L)) == Map(1L -> T0, 4L -> 3L, 5L -> 7L))
  }

  test("warm-start from the base-window fixpoint ≡ cold full fixpoint on random splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n * 4)((rnd.nextInt(n).toLong,
        rnd.nextInt(n).toLong, rnd.nextInt(60).toLong + 1L))
        .filter(e => e._1 != e._2).distinct
      val cut = 40L // base: t < cut; delta: the late edges
      val seeds = Seq(0L, 1L)
      def df(es: Seq[(Long, Long, Long)]) = es.toDF("a", "b", "tsec")
        .select(col("a"), col("b"), timestamp_seconds(col("tsec")).as("t"))
      val s = seeds.toDF("gid")
      val base = Algorithms.temporalEarliestArrival(
        df(edges.filter(_._3 < cut)), s, timestamp_seconds(lit(T0)))
      val warm = Algorithms.temporalEarliestArrival(
        df(edges), s, timestamp_seconds(lit(T0)), init = Some(base))
        .select(col("gid"), unix_timestamp(col("arr")).as("sec"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(warm == reference(edges, seeds), s"trial $trial")
    }
  }

  test("randomized: distributed relaxation ≡ driver fixpoint") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 25 + trial * 15
      val edges = Seq.fill(n * 4)((rnd.nextInt(n).toLong,
        rnd.nextInt(n).toLong, rnd.nextInt(50).toLong + 1L))
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq(0L, 1L, 2L)
      assert(run(edges, seeds) == reference(edges, seeds), s"trial $trial")
    }
  }
}
