package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A typed node set: `_id` (long, unique within the label) + property
  * columns. Mirrors the reference's per-type node map
  * (/root/reference/server/server.go:534 `map[nodeType]map[id]props`) as
  * a DataFrame per label, so every lookup/filter is a parquet scan with
  * pushdown instead of a driver-side hash probe.
  */
final case class NodeSet(label: String, df: DataFrame)

/** A typed edge set: `_src`, `_dst` (node keys in the endpoint labels'
  * key space) + property columns. Mirrors the reference's adjacency list
  * (`server/server.go:540 EdgeInstance`) with FROM/TO endpoint labels as
  * in its catalog (`catalog/types.go:58 EdgeType`).
  */
final case class EdgeSet(label: String, srcLabel: String, dstLabel: String, df: DataFrame)

/** Property graph over DataFrames — the Spark-first re-expression of the
  * reference's in-memory graph. Pattern matching compiles to joins (dims
  * broadcast by Catalyst/AQE), traversals to iterative joins over a
  * global-id-encoded edge table.
  *
  * Global id encoding: `gid = labelIndex * 2^32 + key`. Keys in the test
  * corpus (and any per-label surrogate key scheme) fit in 32 bits per
  * label shard; a wider deployment would bump the multiplier. The same
  * arithmetic is replicated in the DuckDB oracle SQL, so traversal
  * results are verifiable end-to-end.
  */
final class PropertyGraph(
    val nodes: Map[String, NodeSet],
    val edges: Map[String, EdgeSet],
    val labelIndex: Map[String, Int]) {

  import PropertyGraph.GidBase

  def gid(label: String, key: Column): Column =
    lit(labelIndex(label).toLong * GidBase) + key.cast("long")

  /** MATCH <label> WHERE <pred> RETURN <cols> — reference
    * `server/server.go:724 executeMatch` with arbitrary Column
    * predicates instead of equality-only property maps.
    */
  def matchNodes(label: String, pred: Column, returnCols: Seq[String]): DataFrame =
    nodes(label).df.filter(pred).select(returnCols.map(col): _*)

  /** One hop out along an edge label from a node DataFrame keyed by
    * `keyCol`; returns src row joined with edge props and dst key.
    */
  def expandOut(src: DataFrame, keyCol: String, edgeLabel: String,
      edgePred: Column = lit(true)): DataFrame = {
    val e = edges(edgeLabel)
    src.join(e.df.filter(edgePred), src(keyCol) === e.df("_src"))
  }

  /** MATCH a chain pattern: start nodes (filtered by `startPred`) then
    * one hop per edge label, each hop optionally edge-filtered. Returns
    * one row per matched path with columns `k0, k1, ..., kN` (the node
    * key at every position). Compiles to a chain of equi-joins —
    * dimension-sized hops broadcast under AQE, exactly what the
    * reference's nested adjacency walk becomes on Spark.
    */
  def matchPath(startLabel: String, startPred: Column,
      hops: Seq[(String, Column)]): DataFrame = {
    val start = nodes(startLabel).df.filter(startPred)
      .select(col("_id").as("k0"))
    hops.zipWithIndex.foldLeft(start) { case (acc, ((edgeLabel, edgePred), i)) =>
      val e = edges(edgeLabel)
      val hop = e.df.filter(edgePred)
        .select(col("_src").as(s"__s$i"), col("_dst").as(s"k${i + 1}"))
      acc.join(hop, acc(s"k$i") === hop(s"__s$i")).drop(s"__s$i")
    }
  }

  /** Out/in degree per node of `label` over one edge set, including
    * zero-degree nodes (left join, as the reference counts adjacency of
    * every stored node).
    */
  def degrees(label: String, edgeLabel: String, out: Boolean): DataFrame = {
    val e = edges(edgeLabel).df
    val endCol = if (out) "_src" else "_dst"
    val d = e.groupBy(col(endCol).as("_k")).agg(count(lit(1)).as("degree"))
    nodes(label).df.select(col("_id"))
      .join(d, col("_id") === col("_k"), "left")
      .select(col("_id"), coalesce(col("degree"), lit(0L)).as("degree"))
  }

  /** All edges as (gsrc, gdst) global-id pairs — the canonical input of
    * the traversal algorithms. Multiplicity is preserved (multigraph),
    * matching the reference's edge-instance list.
    */
  def gidEdges(labels: Seq[String]): DataFrame =
    labels.map { l =>
      val e = edges(l)
      e.df.select(
        gid(e.srcLabel, col("_src")).as("gsrc"),
        gid(e.dstLabel, col("_dst")).as("gdst"))
    }.reduce(_ unionByName _)

  /** gid-encoded edges with a per-label weight expression (evaluated
    * against each edge label's own columns; use `lit(1.0)` for
    * unweighted labels).
    */
  def gidWeightedEdges(labels: Seq[String], weight: String => Column): DataFrame =
    labels.map { l =>
      val e = edges(l)
      e.df.select(
        gid(e.srcLabel, col("_src")).as("gsrc"),
        gid(e.dstLabel, col("_dst")).as("gdst"),
        weight(l).cast("double").as("w"))
    }.reduce(_ unionByName _)

  /** All node gids across the given labels. */
  def gidNodes(labels: Seq[String]): DataFrame =
    labels.map { l =>
      nodes(l).df.select(gid(l, col("_id")).as("gid"))
    }.reduce(_ unionByName _)

  /** Decode a gid column back to (label, key) for human-readable /
    * oracle-comparable output.
    */
  def decode(df: DataFrame, gidCol: String): DataFrame = {
    val idx = col(gidCol) / lit(GidBase)
    val labelExpr = labelIndex.toSeq.sortBy(_._2).map { case (name, i) =>
      (i, name)
    }.foldLeft(lit(null).cast("string")) { case (acc, (i, name)) =>
      when(floor(idx) === i, lit(name)).otherwise(acc)
    }
    df.withColumn("label", labelExpr)
      .withColumn("key", col(gidCol) % lit(GidBase))
  }
}

object PropertyGraph {
  /** gid = labelIndex * GidBase + key */
  val GidBase: Long = 4294967296L // 2^32
}
