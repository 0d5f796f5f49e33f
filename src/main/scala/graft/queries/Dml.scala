package graft.queries

import graft.{QueryDef, Tables}
import graft.store.{Constraints, GraphStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DML + constraint enforcement as distributed transforms (SURVEY §2.2).
  * Each query applies a GraphStore/Constraints operator to the testdata
  * with a deterministic synthetic batch (derived from the tables
  * themselves, so the DuckDB oracle can reconstruct it with plain SQL).
  */
object Dml {

  /** INSERT NODE with defaults: a supplier-derived batch of new customer
    * rows; `c_acctbal` is absent from the batch and filled by its
    * DEFAULT (0.0), `c_mktsegment` by its DEFAULT ('MACHINERY').
    */
  def gInsertNodes(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "customer")
    val batch = Tables.load(spark, dir, "supplier")
      .filter(col("s_suppkey") <= 20)
      .select(
        (col("s_suppkey") + 10000000L).as("c_custkey"),
        concat(lit("ins_"), col("s_name")).as("c_name"),
        col("s_nationkey").as("c_nationkey"))
    GraphStore.insertNodes(base, batch,
        defaults = Map("c_acctbal" -> lit(0.0), "c_mktsegment" -> lit("MACHINERY")))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("long").as("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
  }

  val gInsertNodesSql: String =
    """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
              round(c_acctbal, 2) AS c_acctbal, c_mktsegment
       FROM customer
       UNION ALL
       SELECT s_suppkey + 10000000, 'ins_' || s_name, CAST(s_nationkey AS BIGINT),
              0.0, 'MACHINERY'
       FROM supplier WHERE s_suppkey <= 20"""

  /** INSERT EDGE with endpoint resolution by property: a batch of
    * customer→nation edges specified by (customer name, nation name),
    * resolved to keys by property match (reference server.go:600).
    */
  def gInsertEdges(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val batch = cust.filter(col("c_custkey") <= 20)
      .join(nation, cust("c_nationkey") === nation("n_nationkey"))
      .select(col("c_name").as("src_c_name"), col("n_name").as("dst_n_name"),
        lit(1.0).as("weight"))
    GraphStore.resolveEdges(batch,
        cust, "c_name", "c_custkey",
        nation, "n_name", "n_nationkey")
      .select(col("_src").cast("long").as("src_custkey"),
        col("_dst").cast("long").as("dst_nationkey"),
        round(col("weight"), 2).as("weight"))
  }

  val gInsertEdgesSql: String =
    """SELECT CAST(c_custkey AS BIGINT) AS src_custkey,
              CAST(n_nationkey AS BIGINT) AS dst_nationkey,
              CAST(1.0 AS DOUBLE) AS weight
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       WHERE c_custkey <= 20"""

  /** UPDATE ... WHERE equality → SET, as a projection (no shuffle). */
  def gUpdateNodes(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "customer")
    GraphStore.updateWhere(base,
        col("c_mktsegment") === "BUILDING",
        Map("c_acctbal" -> (col("c_acctbal") + 100.0),
          "c_mktsegment" -> lit("UPGRADED")))
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"),
        col("c_mktsegment"))
  }

  val gUpdateNodesSql: String =
    """SELECT c_custkey,
              round(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100.0
                         ELSE c_acctbal END, 2) AS c_acctbal,
              CASE WHEN c_mktsegment = 'BUILDING' THEN 'UPGRADED'
                   ELSE c_mktsegment END AS c_mktsegment
       FROM customer"""

  /** DELETE ... WHERE, as a filter on the anti-predicate. */
  def gDeleteNodes(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders")
    GraphStore.deleteWhere(base,
        col("o_orderstatus") === "P" && col("o_totalprice") < 100000.0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
  }

  val gDeleteNodesSql: String =
    """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
       FROM orders
       WHERE NOT (o_orderstatus = 'P' AND o_totalprice < 100000.0)"""

  /** Upsert by PK: a batch that modifies keys 1..10 and inserts ten new
    * keys — anti-join + union, one shuffle on the key.
    */
  def gUpsertNodes(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "customer")
    val existing = base.filter(col("c_custkey") <= 10)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        lit(999.0).as("c_acctbal"), col("c_mktsegment"))
    val fresh = base.filter(col("c_custkey") <= 10)
      .select((col("c_custkey") + 20000000L).as("c_custkey"),
        concat(lit("new_"), col("c_name")).as("c_name"), col("c_nationkey"),
        lit(0.0).as("c_acctbal"), lit("MACHINERY").as("c_mktsegment"))
    val batch = existing.unionByName(fresh)
    GraphStore.upsertByKey(base, batch, "c_custkey")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("long").as("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
  }

  val gUpsertNodesSql: String =
    """WITH batch AS (
         SELECT c_custkey, c_name, c_nationkey, 999.0 AS c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey <= 10
         UNION ALL
         SELECT c_custkey + 20000000, 'new_' || c_name, c_nationkey, 0.0, 'MACHINERY'
         FROM customer WHERE c_custkey <= 10)
       SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
              round(c_acctbal, 2) AS c_acctbal, c_mktsegment
       FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM batch)
       UNION ALL
       SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT),
              round(c_acctbal, 2), c_mktsegment
       FROM batch"""

  /** UNIQUE violation finder: which o_custkey values occur on more than
    * one order (i.e. the column would fail a UNIQUE constraint).
    */
  def gCheckPkUnique(spark: SparkSession, dir: String): DataFrame =
    Constraints.uniqueViolations(Tables.load(spark, dir, "orders"), Seq("o_custkey"))

  val gCheckPkUniqueSql: String =
    """SELECT o_custkey, count(*) AS n_rows FROM orders
       GROUP BY o_custkey HAVING count(*) > 1"""

  /** NOT NULL violation finder over a view with injected nulls (the
    * testdata itself is null-free): value is nulled for error events.
    */
  def gCheckNotnull(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("value", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
    Constraints.notNullViolations(ev, Seq("value"))
      .select(col("event_id"), col("event_type"))
  }

  val gCheckNotnullSql: String =
    """SELECT event_id, event_type FROM (
         SELECT event_id, event_type,
                CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
         FROM events)
       WHERE value IS NULL"""

  /** Enum domain violation finder: o_orderstatus restricted to {O, F}
    * flags the P rows.
    */
  def gCheckEnum(spark: SparkSession, dir: String): DataFrame =
    Constraints.enumViolations(Tables.load(spark, dir, "orders"), "o_orderstatus", Seq("O", "F"))
      .select(col("o_orderkey"), col("o_orderstatus"))

  val gCheckEnumSql: String =
    """SELECT o_orderkey, o_orderstatus FROM orders
       WHERE o_orderstatus NOT IN ('O', 'F')"""

  /** Referential-integrity finder: PLACED edges whose customer endpoint
    * is missing from a truncated node set (c_custkey > 100 kept) — the
    * dangling-edge anti-join.
    */
  def gCheckRefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val edges = orders.select(col("o_custkey").as("src"), col("o_orderkey").as("dst"))
    val srcNodes = Tables.load(spark, dir, "customer").filter(col("c_custkey") > 100)
    val dstNodes = orders
    Constraints.danglingEdges(edges, "src", srcNodes, "c_custkey", "dst", dstNodes, "o_orderkey")
  }

  val gCheckRefIntegritySql: String =
    """WITH e AS (SELECT o_custkey AS src, o_orderkey AS dst FROM orders),
       sn AS (SELECT c_custkey FROM customer WHERE c_custkey > 100)
       SELECT DISTINCT src, dst FROM e
       WHERE NOT EXISTS (SELECT 1 FROM sn WHERE sn.c_custkey = e.src)"""

  /** Cardinality-ONE finder: customers with more than one PLACED edge. */
  def gCheckCardOne(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("_src"), col("o_orderkey").as("_dst"))
    Constraints.cardinalityViolations(edges, "_src")
      .select(col("_src").as("o_custkey"), col("n_edges"))
  }

  val gCheckCardOneSql: String =
    """SELECT o_custkey, count(*) AS n_edges FROM orders
       GROUP BY o_custkey HAVING count(*) > 1"""

  /** CHECK-expression violation finder, driven END-TO-END through the
    * language: the constraint text parses (the reference reserves the
    * CHECK keyword, parser/keywords.go:18, but never grammars it —
    * graft completes it the way SHOW/DESCRIBE were completed), the AST
    * comparisons compile to one codegen'd Catalyst predicate, and the
    * finder returns the rows whose conjunction is definitely FALSE
    * (SQL semantics: NULL passes).
    */
  def gCheckExpr(spark: SparkSession, dir: String): DataFrame = {
    val stmt = graft.lang.Parser.parse(
      "CREATE NODE li_audit (id: int PRIMARY KEY, l_quantity: float, " +
        "l_discount: float CHECK (l_discount <= 0.07 AND l_quantity < 45));")
      .head.asInstanceOf[graft.lang.Ast.CreateNode]
    val cmps = stmt.fields.flatMap(_.check)
    Constraints.checkViolations(Tables.load(spark, dir, "lineitem"), cmps)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_discount"), 2).as("l_discount"),
        round(col("l_quantity"), 2).as("l_quantity"))
  }

  val gCheckExprSql: String =
    """SELECT l_orderkey, l_linenumber, round(l_discount, 2) AS l_discount,
              round(l_quantity, 2) AS l_quantity
       FROM lineitem WHERE NOT (l_discount <= 0.07 AND l_quantity < 45)"""

  /** CHECK with OR and a field-vs-field atom, end-to-end through the
    * language (the round-12 grammar breadth: DNF with standard
    * precedence, sibling-field right-hand sides): the constraint text
    * parses, compiles to ONE scan predicate in CNF-of-complements form
    * (AND of ORs — still parquet-pushable), and the finder returns the
    * rows where the whole disjunction is definitely FALSE.
    */
  def gCheckExprOr(spark: SparkSession, dir: String): DataFrame = {
    val stmt = graft.lang.Parser.parse(
      "CREATE NODE li_audit2 (id: int PRIMARY KEY, l_tax: float, " +
        "l_quantity: float, l_discount: float " +
        "CHECK (l_tax < l_discount OR l_discount <= 0.05 AND l_quantity < 30));")
      .head.asInstanceOf[graft.lang.Ast.CreateNode]
    val dnf = stmt.fields.flatMap(_.check)
    Constraints.checkViolations(Tables.load(spark, dir, "lineitem"), dnf)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_tax"), 2).as("l_tax"),
        round(col("l_discount"), 2).as("l_discount"),
        round(col("l_quantity"), 2).as("l_quantity"))
  }

  val gCheckExprOrSql: String =
    """SELECT l_orderkey, l_linenumber, round(l_tax, 2) AS l_tax,
              round(l_discount, 2) AS l_discount,
              round(l_quantity, 2) AS l_quantity
       FROM lineitem
       WHERE NOT (l_tax < l_discount OR (l_discount <= 0.05 AND l_quantity < 30))"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("g_insert_nodes", gInsertNodes, gInsertNodesSql),
    QueryDef.sql("g_insert_edges", gInsertEdges, gInsertEdgesSql),
    QueryDef.sql("g_update_nodes", gUpdateNodes, gUpdateNodesSql),
    QueryDef.sql("g_delete_nodes", gDeleteNodes, gDeleteNodesSql),
    QueryDef.sql("g_upsert_nodes", gUpsertNodes, gUpsertNodesSql),
    QueryDef.sql("g_check_pk_unique", gCheckPkUnique, gCheckPkUniqueSql),
    QueryDef.sql("g_check_notnull", gCheckNotnull, gCheckNotnullSql),
    QueryDef.sql("g_check_enum", gCheckEnum, gCheckEnumSql),
    QueryDef.sql("g_check_ref_integrity", gCheckRefIntegrity, gCheckRefIntegritySql),
    QueryDef.sql("g_check_card_one", gCheckCardOne, gCheckCardOneSql),
    QueryDef.sql("g_check_expr", gCheckExpr, gCheckExprSql),
    QueryDef.sql("g_check_expr_or", gCheckExprOr, gCheckExprOrSql))
}
