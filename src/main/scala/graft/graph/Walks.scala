package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derandomized random-walk corpus generation — the DeepWalk/node2vec
  * input step (Perozzi et al. 2014): one fixed-length walk per seed
  * node over the undirected graph, emitted as a path string ready to
  * feed a skip-gram trainer exactly like a text corpus feeds an LM.
  *
  * "Random" is re-expressed as a PURE FUNCTION of (walk_id, step,
  * candidate): each step keeps the neighbor minimizing
  * md5(walk_id:step:neighbor) — per-walk-independent, uniform over the
  * neighbor set, reproducible across runs, engines, and partitionings,
  * and therefore exactly unrollable into a SQL oracle (the same
  * derandomization discipline as the md5 split/sample family).
  *
  * Loop discipline matches [[Algorithms]]: AQE off with the width
  * pinned, the edge list hash-partitioned by source ONCE, the walk
  * state hash-partitioned by walk_id ONCE and preserved by
  * localCheckpoint. Per step only the (walk_id, cur) frontier shuffles
  * — the growing path strings never leave their walk_id partition: the
  * neighbor argmin aggregates bare (walk_id, hash, neighbor) rows, and
  * the join-back onto the path state is exchange-free on both sides.
  * Dead ends (isolated seeds) carry their path unchanged.
  *
  * Both walk families accept a prepared [[Algorithms.AdjGraph]] so the
  * undirected union/checkpoint they need is the SAME pinned invariant
  * the neighborhood-scoring queries already materialize — a walk query
  * then pays zero per-call derivation of the graph itself.
  */
object Walks {

  /** Uniform walks over the pinned adjacency invariant — skips the
    * per-call undirected-union derivation + checkpoint.
    */
  def randomWalks(g: Algorithms.AdjGraph, nodes: DataFrame, steps: Int): DataFrame =
    uniformLoop(g.und, nodes, steps)

  def randomWalks(nodes: DataFrame, edges: DataFrame, steps: Int): DataFrame = {
    val und0 = edges.select(col("gsrc").as("a"), col("gdst").as("b"))
      .unionByName(edges.select(col("gdst").as("a"), col("gsrc").as("b")))
      .localCheckpoint()
    uniformLoop(und0, nodes, steps)
  }

  private def uniformLoop(und0: DataFrame, nodes: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val width = Algorithms.loopWidth(und0, und0.count())
    Algorithms.withoutAqe(und0, Some(width)) {
    val und = und0.repartition(width, col("a")).localCheckpoint()
    var walks = nodes.select(col("gid").as("walk_id"), col("gid").as("cur"),
        col("gid").cast("string").as("path"))
      .repartition(width, col("walk_id")).localCheckpoint()
    for (step <- 1 to steps) {
      // frontier only: (walk_id, cur) shuffles to meet the edge layout;
      // the left join keeps dead-end walks in the aggregate's domain
      val pick = walks.select(col("walk_id"), col("cur"))
        .join(und.hint("shuffle_hash"), col("cur") === col("a"), "left")
        .groupBy(col("walk_id"))
        .agg(min(when(col("b").isNotNull, struct(
          md5(concat_ws(":", col("walk_id"), lit(step), col("b"))).as("h"),
          col("b").as("nb")))).as("sel"))
      // pick leaves its groupBy hash(walk_id)-partitioned; walks is
      // checkpointed with the same layout — exchange-free join-back
      walks = walks.join(pick.hint("shuffle_hash"), Seq("walk_id"))
        .select(col("walk_id"),
          coalesce(col("sel.nb"), col("cur")).as("cur"),
          when(col("sel.nb").isNotNull,
            concat(col("path"), lit("->"), col("sel.nb")))
            .otherwise(col("path")).as("path"))
        .localCheckpoint()
    }
    walks.select(col("walk_id"), col("path"))
    } // withoutAqe
  }

  /** node2vec-biased walks (Grover & Leskovec 2016): the same
    * derandomized machinery as [[randomWalks]], but each step picks
    * among neighbors with the p/q search bias — α = 1/p for returning
    * to the previous node, 1 for neighbors of the previous node
    * (BFS-ish), 1/q for everything farther (DFS-ish). The weighted
    * "random" choice is the A-ES key (pow(u, 1/α) maximized, u an
    * md5-derived uniform of (walk_id, step, candidate) — the recipe
    * [[graft.pipeline.Splits.weightedSample]] proves portable), rounded
    * to 9 dp so cross-engine pow ULP can't flip a pick.
    *
    * The second-order "is the candidate adjacent to the PREVIOUS node"
    * test joins the candidate stream against a NODE-keyed table of
    * sorted neighbor arrays on `prev` alone and evaluates
    * `array_contains(nbrs, candidate)` — a node-sized build side. The
    * earlier formulation joined candidates against the FULL edge list
    * on the composite (prev, candidate) key: at 100× scale that is an
    * edge-sized build and the widest shuffle in the repo, where the
    * adjacency-array build is node-sized (the array payload totals the
    * edge count, but it rides a build relation keyed and partitioned by
    * node, built exchange-free from the already-hash(a) edge layout).
    */
  def node2vecWalks(g: Algorithms.AdjGraph, nodes: DataFrame, steps: Int,
      p: Double, q: Double): DataFrame =
    node2vecLoop(g.und, nodes, steps, p, q)

  def node2vecWalks(nodes: DataFrame, edges: DataFrame, steps: Int,
      p: Double, q: Double): DataFrame = {
    val und0 = edges.select(col("gsrc").as("a"), col("gdst").as("b"))
      .unionByName(edges.select(col("gdst").as("a"), col("gsrc").as("b")))
      .distinct().localCheckpoint()
    node2vecLoop(und0, nodes, steps, p, q)
  }

  private def node2vecLoop(und0: DataFrame, nodes: DataFrame, steps: Int,
      p: Double, q: Double): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(p > 0 && q > 0, "p and q must be positive")
    val width = Algorithms.loopWidth(und0, und0.count())
    Algorithms.withoutAqe(und0, Some(width)) {
    val und = und0.repartition(width, col("a")).localCheckpoint()
    // node-keyed sorted adjacency arrays for the membership test;
    // groupBy rides the hash(a) layout, so this aggregation (and the
    // per-step probe build) is exchange-free
    val nbrs = und.groupBy(col("a").as("na"))
      .agg(array_sort(collect_set(col("b"))).as("nbrs"))
      .localCheckpoint()
    var walks = nodes.select(col("gid").as("walk_id"),
        lit(null).cast("long").as("prev"), col("gid").as("cur"),
        col("gid").cast("string").as("path"))
      .repartition(width, col("walk_id")).localCheckpoint()
    for (step <- 1 to steps) {
      val cand = walks.select(col("walk_id"), col("prev"), col("cur"))
        .join(und.hint("shuffle_hash"), col("cur") === col("a"), "left")
      // prev-adjacency via the node-keyed array table: at step 1 prev is
      // null → no match → adj = false → the uniform 1/q branch, exactly
      // the composite-join behavior
      val flagged = cand.join(nbrs.hint("shuffle_hash"),
        col("prev") === col("na"), "left")
      val u = conv(substring(md5(
          concat_ws(":", col("walk_id"), lit(step), col("b"))), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0) // 2^52
      val adj = coalesce(array_contains(col("nbrs"), col("b")), lit(false))
      val alpha = when(col("b") === col("prev"), lit(1.0 / p))
        .when(adj, lit(1.0))
        .otherwise(lit(1.0 / q))
      val pick = flagged
        .groupBy(col("walk_id"))
        .agg(max(when(col("b").isNotNull, struct(
          round(pow(u, lit(1.0) / alpha), 9).as("k"),
          col("b").as("nb")))).as("sel"))
      walks = walks.join(pick.hint("shuffle_hash"), Seq("walk_id"))
        .select(col("walk_id"),
          when(col("sel.nb").isNotNull, col("cur")).otherwise(col("prev"))
            .as("prev"),
          coalesce(col("sel.nb"), col("cur")).as("cur"),
          when(col("sel.nb").isNotNull,
            concat(col("path"), lit("->"), col("sel.nb")))
            .otherwise(col("path")).as("path"))
        .localCheckpoint()
    }
    walks.select(col("walk_id"), col("path"))
    } // withoutAqe
  }
}
