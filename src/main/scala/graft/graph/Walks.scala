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
}
