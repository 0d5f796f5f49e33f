package graft.graph

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The property-graph view of the driver's TPC-H-ish testdata — the
  * graft analogue of a user's CREATE NODE / CREATE EDGE script in the
  * reference (README.md "Playing around"). Node keys are the natural
  * TPC-H primary keys; edges come from the foreign keys and from
  * lineitem (order composition).
  *
  *   Customer -PLACED->      Orders
  *   Orders   -CONTAINS->    Part      (props: quantity, extendedprice)
  *   Part     -SUPPLIED_BY-> Supplier  (per lineitem)
  *   Customer -IN_NATION->   Nation
  *   Supplier -SUPP_NATION-> Nation
  *   Nation   -IN_REGION->   Region
  */
object TpchGraph {

  val labelIndex: Map[String, Int] = Map(
    "region" -> 0, "nation" -> 1, "customer" -> 2,
    "supplier" -> 3, "part" -> 4, "orders" -> 5)

  val nodeLabels: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders")

  val edgeLabels: Seq[String] =
    Seq("PLACED", "CONTAINS", "SUPPLIED_BY", "IN_NATION", "SUPP_NATION", "IN_REGION")

  def apply(spark: SparkSession, dir: String): PropertyGraph = {
    def t(n: String) = Tables.load(spark, dir, n)

    val nodes = Map(
      "region" -> NodeSet("region", t("region")
        .select(col("r_regionkey").cast("long").as("_id"), col("r_name"))),
      "nation" -> NodeSet("nation", t("nation")
        .select(col("n_nationkey").cast("long").as("_id"), col("n_name"))),
      "customer" -> NodeSet("customer", t("customer")
        .select(col("c_custkey").as("_id"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal"))),
      "supplier" -> NodeSet("supplier", t("supplier")
        .select(col("s_suppkey").as("_id"), col("s_name"), col("s_acctbal"))),
      "part" -> NodeSet("part", t("part")
        .select(col("p_partkey").as("_id"), col("p_name"), col("p_brand"),
          col("p_retailprice"))),
      "orders" -> NodeSet("orders", t("orders")
        .select(col("o_orderkey").as("_id"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"))))

    val li = t("lineitem")
    val edges = Map(
      "PLACED" -> EdgeSet("PLACED", "customer", "orders", t("orders")
        .select(col("o_custkey").as("_src"), col("o_orderkey").as("_dst"))),
      "CONTAINS" -> EdgeSet("CONTAINS", "orders", "part", li
        .select(col("l_orderkey").as("_src"), col("l_partkey").as("_dst"),
          col("l_quantity"), col("l_extendedprice"))),
      "SUPPLIED_BY" -> EdgeSet("SUPPLIED_BY", "part", "supplier", li
        .select(col("l_partkey").as("_src"), col("l_suppkey").as("_dst"))),
      "IN_NATION" -> EdgeSet("IN_NATION", "customer", "nation", t("customer")
        .select(col("c_custkey").as("_src"), col("c_nationkey").cast("long").as("_dst"))),
      "SUPP_NATION" -> EdgeSet("SUPP_NATION", "supplier", "nation", t("supplier")
        .select(col("s_suppkey").as("_src"), col("s_nationkey").cast("long").as("_dst"))),
      "IN_REGION" -> EdgeSet("IN_REGION", "nation", "region", t("nation")
        .select(col("n_nationkey").cast("long").as("_src"), col("n_regionkey").cast("long").as("_dst"))))

    new PropertyGraph(nodes, edges, labelIndex)
  }

  /** The oracle-side mirror of the gid encoding + edge union, as DuckDB
    * SQL fragments. Kept adjacent to the Scala definitions so the two
    * stay in sync.
    */
  val gidSqlNodes: String =
    """SELECT 0*4294967296 + r_regionkey AS gid FROM region
       UNION ALL SELECT 1*4294967296 + n_nationkey FROM nation
       UNION ALL SELECT 2*4294967296 + c_custkey FROM customer
       UNION ALL SELECT 3*4294967296 + s_suppkey FROM supplier
       UNION ALL SELECT 4*4294967296 + p_partkey FROM part
       UNION ALL SELECT 5*4294967296 + o_orderkey FROM orders"""

  val gidSqlEdges: String =
    """SELECT 2*4294967296 + o_custkey AS gsrc, 5*4294967296 + o_orderkey AS gdst FROM orders
       UNION ALL SELECT 5*4294967296 + l_orderkey, 4*4294967296 + l_partkey FROM lineitem
       UNION ALL SELECT 4*4294967296 + l_partkey, 3*4294967296 + l_suppkey FROM lineitem
       UNION ALL SELECT 2*4294967296 + c_custkey, 1*4294967296 + c_nationkey FROM customer
       UNION ALL SELECT 3*4294967296 + s_suppkey, 1*4294967296 + s_nationkey FROM supplier
       UNION ALL SELECT 1*4294967296 + n_nationkey, 0*4294967296 + n_regionkey FROM nation"""

  /** Weighted edge mirror for shortest-path oracles: CONTAINS carries
    * l_quantity, every other label weight 1 — kept in lockstep with
    * [[graft.queries.GraphOps.gSssp]]'s Spark-side weight function.
    */
  val gidSqlWeightedEdges: String =
    """SELECT 2*4294967296 + o_custkey AS gsrc, 5*4294967296 + o_orderkey AS gdst,
              CAST(1.0 AS DOUBLE) AS w FROM orders
       UNION ALL SELECT 5*4294967296 + l_orderkey, 4*4294967296 + l_partkey,
              CAST(l_quantity AS DOUBLE) FROM lineitem
       UNION ALL SELECT 4*4294967296 + l_partkey, 3*4294967296 + l_suppkey,
              CAST(1.0 AS DOUBLE) FROM lineitem
       UNION ALL SELECT 2*4294967296 + c_custkey, 1*4294967296 + c_nationkey,
              CAST(1.0 AS DOUBLE) FROM customer
       UNION ALL SELECT 3*4294967296 + s_suppkey, 1*4294967296 + s_nationkey,
              CAST(1.0 AS DOUBLE) FROM supplier
       UNION ALL SELECT 1*4294967296 + n_nationkey, 0*4294967296 + n_regionkey,
              CAST(1.0 AS DOUBLE) FROM nation"""

  /** gid → label-name CASE expression for oracle output decoding. */
  val gidSqlLabel: String =
    """CASE CAST(gid // 4294967296 AS INT)
         WHEN 0 THEN 'region' WHEN 1 THEN 'nation' WHEN 2 THEN 'customer'
         WHEN 3 THEN 'supplier' WHEN 4 THEN 'part' WHEN 5 THEN 'orders' END"""
}
