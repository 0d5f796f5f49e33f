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
  */
object Walks {

  def randomWalks(nodes: DataFrame, edges: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val und0 = edges.select(col("gsrc").as("a"), col("gdst").as("b"))
      .unionByName(edges.select(col("gdst").as("a"), col("gsrc").as("b")))
      .localCheckpoint()
    val width = Algorithms.loopWidth(edges, und0.count())
    Algorithms.withoutAqe(edges, Some(width)) {
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
    * to 9 dp so cross-engine pow ULP can't flip a pick. The extra cost
    * over the uniform walk is one membership join per step (is the
    * candidate adjacent to the PREVIOUS node) — the price of the
    * second-order bias, linear in candidate volume.
    */
  def node2vecWalks(nodes: DataFrame, edges: DataFrame, steps: Int,
      p: Double, q: Double): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(p > 0 && q > 0, "p and q must be positive")
    val und0 = edges.select(col("gsrc").as("a"), col("gdst").as("b"))
      .unionByName(edges.select(col("gdst").as("a"), col("gsrc").as("b")))
      .distinct().localCheckpoint()
    val width = Algorithms.loopWidth(edges, und0.count())
    Algorithms.withoutAqe(edges, Some(width)) {
    val und = und0.repartition(width, col("a")).localCheckpoint()
    var walks = nodes.select(col("gid").as("walk_id"),
        lit(null).cast("long").as("prev"), col("gid").as("cur"),
        col("gid").cast("string").as("path"))
      .repartition(width, col("walk_id")).localCheckpoint()
    for (step <- 1 to steps) {
      val cand = walks.select(col("walk_id"), col("prev"), col("cur"))
        .join(und.hint("shuffle_hash"), col("cur") === col("a"), "left")
      val flagged = cand.join(
        und.select(col("a").as("ma"), col("b").as("mb")).hint("shuffle_hash"),
        col("prev") === col("ma") && col("b") === col("mb"), "left")
      val u = conv(substring(md5(
          concat_ws(":", col("walk_id"), lit(step), col("b"))), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0) // 2^52
      val alpha = when(col("b") === col("prev"), lit(1.0 / p))
        .when(col("mb").isNotNull, lit(1.0))
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
