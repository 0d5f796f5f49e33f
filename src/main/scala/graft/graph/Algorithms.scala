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
    // loop-invariant: materialize once, not re-derived from source per hop
    val e = edges.select(col("gsrc"), col("gdst")).localCheckpoint()
    var visited = seeds.select(col("gid"), lit(0).as("hop")).localCheckpoint()
    var frontier = visited.select("gid")
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier.join(e, frontier("gid") === e("gsrc"))
        .select(e("gdst").as("gid")).distinct()
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
    // Loop invariants materialize once: edge list, and the rank base with
    // the static out-degree attached (null ⇒ dangling). Carrying outdeg
    // inside the rank vector removes a pr×deg join from every iteration —
    // the dangling-mass term becomes a scan-agg over pr alone.
    val e = edges.select(col("gsrc"), col("gdst")).localCheckpoint()
    val deg = e.groupBy(col("gsrc").as("dgid")).agg(count(lit(1)).as("outdeg"))
    val base = nodes.select(col("gid"))
      .join(deg, col("gid") === col("dgid"), "left")
      .select(col("gid"), col("outdeg"))
      .localCheckpoint()
    val n = base.count().toDouble
    var pr = base.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to iters) {
      val danglingMass = pr.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      val contribs = e
        .join(pr.filter(col("outdeg").isNotNull), e("gsrc") === col("gid"))
        .groupBy(e("gdst").as("cgid"))
        .agg(sum(col("pr") / col("outdeg")).as("contrib"))
      pr = base
        .join(contribs, col("gid") === col("cgid"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(col("gid"), col("outdeg"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + col("dm") / lit(n))).as("pr"))
      // checkpoint every round: pr feeds three branches of the next
      // iteration's plan, and exchange reuse does not cover the broadcast
      // subquery — lazy chaining recomputes the subtree exponentially
      pr = pr.localCheckpoint()
    }
    pr.select(col("gid"), col("pr"))
  }

  /** Global triangle count over an undirected simple graph given as
    * (gsrc, gdst) pairs (any orientation, multiplicity allowed — they
    * are canonicalized to a<b and deduped here).
    *
    * Degree-ordered node-iterator: orient every edge from its
    * lower-(degree, id) endpoint to the higher one, build wedges from
    * each node's out-neighbors, and close them against the canonical
    * edge set. Orienting by degree bounds every out-degree by O(√m), so
    * wedge volume is O(m^1.5) even on skewed graphs — id-ordered
    * self-joins blow up quadratically on high-degree hubs. The
    * (potentially expensive) upstream edge derivation is checkpointed
    * once instead of recomputed per join leg.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val canon = edges.select(
      least(col("gsrc"), col("gdst")).as("a"),
      greatest(col("gsrc"), col("gdst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("a").as("v")).unionAll(canon.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("v").as("va"), col("d").as("da")), col("a") === col("va"))
      .join(deg.select(col("v").as("vb"), col("d").as("db")), col("b") === col("vb"))
    // orient low-rank → high-rank, rank = (degree, id)
    val oriented = withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .localCheckpoint()
    // wedges at apex u: unordered out-neighbor pairs, canonical id order,
    // closed by the canonical edge set — each triangle counted exactly
    // once (its unique lowest-rank vertex is the apex).
    val w2 = oriented.select(col("u").as("u2"), col("w").as("w2"))
    oriented.join(w2, col("u") === col("u2") && col("w") < col("w2"))
      .select(col("w").as("ca"), col("w2").as("cb"))
      .join(canon, col("ca") === col("a") && col("cb") === col("b"), "left_semi")
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
