package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph algorithms over (gsrc, gdst) edge DataFrames.
  *
  * All loops are DataFrame-iterative with `localCheckpoint` per round to
  * truncate lineage (a 100-iteration lazy chain would blow up the
  * Catalyst plan); convergence checks use `isEmpty` on a changed-set,
  * never a count of the whole graph. The reference computes none of
  * these (its MATCH stops at property filters), but they are the
  * analytics payoff of holding the graph in Spark.
  */
object Algorithms {

  /** Hop distance from a seed set by frontier BFS over a directed edge
    * list (pass an undirected graph as edges ∪ reversed edges). Returns
    * (gid, hop) with the minimum hop per reached node. Each iteration is
    * one shuffle: frontier ⋈ edges, minus visited.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var visited = seeds.select(col("gid"), lit(0).as("hop")).localCheckpoint()
    var frontier = visited.select("gid")
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier.join(edges, frontier("gid") === edges("gsrc"))
        .select(edges("gdst").as("gid")).distinct()
        .join(visited.select(col("gid").as("v")), col("gid") === col("v"), "left_anti")
        .localCheckpoint()
      visited = visited.unionByName(next.withColumn("hop", lit(hop))).localCheckpoint()
      frontier = next
    }
    visited
  }

  /** Connected components by iterative min-label propagation: every node
    * adopts the smallest component id among itself and its neighbors
    * until fixpoint. O(diameter) rounds of one shuffle each; isolated
    * nodes keep their own id. Returns (gid, comp).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val undirected = edges.select(col("gsrc").as("a"), col("gdst").as("b"))
      .unionByName(edges.select(col("gdst").as("a"), col("gsrc").as("b")))
      .distinct().localCheckpoint()
    var comp = nodes.select(col("gid"), col("gid").as("comp")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // min over each node's own comp and its neighbors' comps
      val neighborMin = undirected
        .join(comp, col("b") === col("gid"))
        .groupBy(col("a")).agg(min(col("comp")).as("ncomp"))
      val next = comp.join(neighborMin, comp("gid") === col("a"), "left")
        .select(comp("gid"),
          least(comp("comp"), coalesce(col("ncomp"), comp("comp"))).as("comp"))
        .localCheckpoint()
      converged = next.join(comp.withColumnRenamed("comp", "old"), "gid")
        .filter(col("comp") =!= col("old")).isEmpty
      comp = next
    }
    comp
  }

  /** PageRank with uniform teleport and dangling-mass redistribution,
    * fixed iteration count (deterministic, oracle-replicable). One
    * shuffle per iteration (contribution groupBy); the dangling-mass
    * scalar is carried as a broadcast cross join so the loop stays lazy
    * apart from the per-round checkpoint.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    val n = nodes.count().toDouble
    val deg = edges.groupBy(col("gsrc").as("dgid")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    var pr = nodes.select(col("gid"), lit(1.0 / n).as("pr")).localCheckpoint()
    for (_ <- 1 to iters) {
      val withDeg = pr.join(deg, pr("gid") === col("dgid"), "left")
      val danglingMass = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      val contribs = edges
        .join(pr, edges("gsrc") === pr("gid"))
        .join(deg, col("dgid") === edges("gsrc"))
        .groupBy(edges("gdst").as("cgid"))
        .agg(sum(col("pr") / col("outdeg")).as("contrib"))
      pr = nodes.select(col("gid"))
        .join(contribs, col("gid") === col("cgid"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(col("gid"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + col("dm") / lit(n))).as("pr"))
        .localCheckpoint()
    }
    pr
  }

  /** Global triangle count over an undirected simple graph given as
    * (gsrc, gdst) pairs (any orientation, multiplicity allowed — they
    * are canonicalized to a<b and deduped here). Standard ordered
    * 3-way self-join; each join shuffles on one key.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val canon = edges.select(
      least(col("gsrc"), col("gdst")).as("a"),
      greatest(col("gsrc"), col("gdst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e1 = canon
    val e2 = canon.select(col("a").as("b2"), col("b").as("c"))
    val e3 = canon.select(col("a").as("a3"), col("b").as("c3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("triangles"))
  }

  /** Community detection by synchronous label propagation with a
    * deterministic tie-break (smallest label among the most frequent).
    * Fixed iteration count keeps it reproducible.
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val undirected = edges.select(col("gsrc").as("a"), col("gdst").as("b"))
      .unionByName(edges.select(col("gdst").as("a"), col("gsrc").as("b")))
      .localCheckpoint()
    var labels = nodes.select(col("gid"), col("gid").as("community")).localCheckpoint()
    for (_ <- 1 to iters) {
      val counted = undirected.join(labels, col("b") === col("gid"))
        .groupBy(col("a"), col("community")).agg(count(lit(1)).as("votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a"))
        .orderBy(col("votes").desc, col("community"))
      val best = counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("a"), col("community").as("newc"))
      labels = labels.join(best, labels("gid") === col("a"), "left")
        .select(labels("gid"), coalesce(col("newc"), col("community")).as("community"))
        .localCheckpoint()
    }
    labels
  }
}
