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
    // node-keyed sorted adjacency arrays: the argmin over N(cur) runs as
    // a higher-order fold over ONE array per walker per step — no
    // candidate-row explosion and no per-step groupBy. The md5-hex fold
    // keeps the lexicographic (h, nb) minimum; ascending array order +
    // strict < reproduces min(struct(h, nb)) exactly (first minimal
    // wins = smaller nb on an md5 tie), and collect_set's dedup is
    // pick-invariant (min over a set = min over the multiset).
    val nbrs = und0.repartition(width, col("a"))
      .groupBy(col("a").as("na"))
      .agg(array_sort(collect_set(col("b"))).as("nbrs"))
      .localCheckpoint()
    var walks = nodes.select(col("gid").as("walk_id"), col("gid").as("cur"),
        col("gid").cast("string").as("path"))
      .repartition(width, col("walk_id")).localCheckpoint()
    for (step <- 1 to steps) {
      // frontier only: (walk_id, cur) meets the node-keyed array table;
      // the growing path strings never leave their walk_id partition
      val pick = walks.select(col("walk_id"), col("cur"))
        .join(nbrs.hint("shuffle_hash"), col("cur") === col("na"), "left")
        .select(col("walk_id"), aggregate(
          coalesce(col("nbrs"), array().cast("array<bigint>")),
          struct(lit("g").as("h"), lit(null).cast("bigint").as("nb")),
          (acc, b) => {
            val h = md5(concat_ws(":", col("walk_id"), lit(step), b))
            when(h < acc.getField("h"), struct(h.as("h"), b.as("nb")))
              .otherwise(acc)
          }).as("sel"))
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
    // node-keyed sorted adjacency arrays are the ONLY graph
    // representation the loop touches: the A-ES argmax over N(cur) runs
    // as a higher-order fold over one array per walker per step, with
    // the second-order "adjacent to prev" test an array_contains against
    // N(prev) CARRIED IN THE WALKER STATE from the previous step (the
    // array was already in hand when the walker stepped — carrying it
    // forward replaces the per-step membership join entirely). Per step:
    // one node-keyed join + pure codegen arithmetic; no wedge-volume
    // candidate stream, no per-candidate array duplication, no groupBy.
    val nbrs = und0.repartition(width, col("a"))
      .groupBy(col("a").as("na"))
      .agg(array_sort(collect_set(col("b"))).as("nbrs"))
      .localCheckpoint()
    var walks = nodes.select(col("gid").as("walk_id"),
        lit(null).cast("long").as("prev"), col("gid").as("cur"),
        col("gid").cast("string").as("path"),
        lit(null).cast("array<bigint>").as("pnbrs"))
      .repartition(width, col("walk_id")).localCheckpoint()
    for (step <- 1 to steps) {
      // frontier (walk_id, prev, cur, pnbrs) meets the array table on
      // cur; path strings never leave their walk_id partition. At step 1
      // prev/pnbrs are null → array_contains is null → the uniform 1/q
      // branch, exactly the former composite-join behavior.
      val pick = walks.select(col("walk_id"), col("prev"), col("cur"),
          col("pnbrs"))
        .join(nbrs.hint("shuffle_hash"), col("cur") === col("na"), "left")
        .select(col("walk_id"), col("nbrs"), aggregate(
          coalesce(col("nbrs"), array().cast("array<bigint>")),
          struct(lit(-1.0).as("k"), lit(null).cast("bigint").as("nb")),
          (acc, b) => {
            val u = conv(substring(md5(
                concat_ws(":", col("walk_id"), lit(step), b)), 1, 13), 16, 10)
              .cast("double") / lit(4503599627370496.0) // 2^52
            val adj = coalesce(array_contains(col("pnbrs"), b), lit(false))
            val alpha = when(b === col("prev"), lit(1.0 / p))
              .when(adj, lit(1.0))
              .otherwise(lit(1.0 / q))
            val k = round(pow(u, lit(1.0) / alpha), 9)
            // ascending array + >= takes the larger nb on a key tie —
            // exactly max(struct(k, nb))
            when(k >= acc.getField("k"), struct(k.as("k"), b.as("nb")))
              .otherwise(acc)
          }).as("sel"))
      walks = walks.join(pick.hint("shuffle_hash"), Seq("walk_id"))
        .select(col("walk_id"),
          when(col("sel.nb").isNotNull, col("cur")).otherwise(col("prev"))
            .as("prev"),
          coalesce(col("sel.nb"), col("cur")).as("cur"),
          when(col("sel.nb").isNotNull,
            concat(col("path"), lit("->"), col("sel.nb")))
            .otherwise(col("path")).as("path"),
          when(col("sel.nb").isNotNull, col("nbrs")).otherwise(col("pnbrs"))
            .as("pnbrs"))
        .localCheckpoint()
    }
    walks.select(col("walk_id"), col("path"))
    } // withoutAqe
  }
}
