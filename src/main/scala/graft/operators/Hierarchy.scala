package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy (forest) ancestor closure — the distributed form of a
  * recursive CTE (`WITH RECURSIVE` walking child→parent edges, the
  * reference's multi-hop MATCH generalized to unbounded depth;
  * reference parser/parser.go MATCH chains are the fixed-depth face).
  *
  * Pointer doubling, not linear recursion: round k joins the EXACT
  * depth-2^(k-1) frontier against the whole closure-so-far, doubling
  * the covered depth each round — O(log d) shuffle rounds for a
  * depth-d hierarchy where the naive parent-at-a-time loop (and a
  * recursive CTE) pays O(d). At 100 TB an org/category hierarchy is
  * shallow but wide: each round is one equi-join shuffle over the
  * (node-count-bounded) closure, and the frontier restriction keeps
  * the join duplicate-free — in a forest every node has at most ONE
  * ancestor at each depth, so (frontier at exactly depth f) ⋈
  * (closure at depth ≤ f) yields each new (node, ancestor) pair
  * exactly once. No distinct needed, ever.
  */
object Hierarchy {

  /** All (node, anc, depth) pairs of the parent forest.
    *
    * @param parents child→parent edges as columns (node, parent); each
    *                node must have at most one parent and no cycles
    *                (a forest — the caller's contract).
    * @param maxDepth upper bound on emitted depths. The doubling round
    *                 at frontier depth f produces rows up to depth 2f,
    *                 so the bound is enforced by a final filter, not by
    *                 the loop exit alone (non-power-of-two values would
    *                 otherwise overshoot).
    */
  def closure(parents: DataFrame, maxDepth: Long = 1L << 40): DataFrame = {
    var closure = parents
      .select(col("node"), col("parent").as("anc"), lit(1L).as("depth"))
      .localCheckpoint()
    var frontDepth = 1L
    var done = false
    while (!done && frontDepth < maxDepth) {
      val frontier = closure.filter(col("depth") === frontDepth)
      val jump = closure.select(col("node").as("jn"), col("anc").as("janc"),
        col("depth").as("jd"))
      val jumped = frontier.join(jump, col("anc") === col("jn"))
        .select(col("node"), col("janc").as("anc"),
          (col("depth") + col("jd")).as("depth"))
        .localCheckpoint()
      if (jumped.isEmpty) done = true
      else {
        closure = closure.unionByName(jumped).localCheckpoint()
        frontDepth *= 2
      }
    }
    closure.filter(col("depth") <= maxDepth)
  }
}
