package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Constraint enforcement as distributed violation finders (reference:
  * /root/reference/catalog/types.go PRIMARY KEY / UNIQUE / NOT NULL /
  * enum checks applied per-row at insert, server.go:560-590).
  *
  * In a batch engine the idiomatic posture is validate-the-set: each
  * check is a full-scan aggregation or anti-join that shuffles once on
  * the checked key and returns the violating rows (empty = constraint
  * holds). Callers gate a write on `violations.isEmpty`.
  */
object Constraints {

  /** PK / UNIQUE: key tuples appearing more than once. */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** NOT NULL: rows with a null in any required column. */
  def notNullViolations(df: DataFrame, required: Seq[String]): DataFrame =
    df.filter(required.map(c => col(c).isNull).reduce(_ || _))

  /** Enum domain: rows whose column value is outside the allowed set. */
  def enumViolations(df: DataFrame, column: String, allowed: Seq[String]): DataFrame =
    df.filter(!col(column).isin(allowed: _*))

  /** Referential integrity: edges whose src/dst key has no node row
    * (reference validates endpoints on insert, server.go:612). Left-anti
    * joins; node key sets broadcast when small.
    */
  def danglingEdges(edges: DataFrame, srcCol: String, srcNodes: DataFrame, srcKey: String,
      dstCol: String, dstNodes: DataFrame, dstKey: String): DataFrame = {
    val noSrc = edges.join(srcNodes.select(col(srcKey).as(srcCol)), Seq(srcCol), "left_anti")
    val noDst = edges.join(dstNodes.select(col(dstKey).as(dstCol)), Seq(dstCol), "left_anti")
    noSrc.unionByName(noDst).distinct()
  }

  /** Cardinality ONE (reference catalog edge cardinality,
    * catalog/types.go:58): endpoint keys with more than one edge.
    */
  def cardinalityViolations(edges: DataFrame, endpointCol: String): DataFrame =
    edges.groupBy(col(endpointCol))
      .agg(count(lit(1)).as("n_edges"))
      .filter(col("n_edges") > 1)

  /** The COMPLEMENT of one CHECK atom as a Catalyst predicate —
    * literal typed by its lexical kind (numbers with a '.' compare as
    * double, else long), or a sibling-field column when the atom is
    * field-vs-field. The complement is TRUE exactly where the atom is
    * FALSE, and NULL where the atom is NULL (a NULL field or a null
    * literal), which is what the violation filter needs.
    */
  private def complementColumn(c: graft.lang.Ast.CheckCmp): Column = {
    import graft.lang.Ast.{CmpOp, LitKind}
    val v: Column = c.rhsField.map(col).getOrElse(c.value.kind match {
      case LitKind.Num =>
        if (c.value.text.contains('.')) lit(c.value.text.toDouble)
        else lit(c.value.text.toLong)
      case LitKind.Str => lit(c.value.text)
      case LitKind.Bool => lit(c.value.text.toBoolean)
      case LitKind.Null => lit(null)
    })
    val f = col(c.field)
    c.op match {
      case CmpOp.Eq => f =!= v
      case CmpOp.Ne => f === v
      case CmpOp.Lt => f >= v
      case CmpOp.Le => f > v
      case CmpOp.Gt => f <= v
      case CmpOp.Ge => f < v
    }
  }

  /** CHECK in DNF (outer OR, inner AND): rows where the expression
    * evaluates to FALSE. SQL CHECK semantics — a NULL result PASSES the
    * constraint (only a definite FALSE violates). A disjunction is
    * FALSE iff EVERY conjunction is FALSE; a conjunction is FALSE iff
    * some atom is FALSE iff some COMPLEMENT atom is TRUE (3VL: a NULL
    * atom's complement is also NULL, never TRUE). So the filter is the
    * CNF of complement atoms — an AND of ORs of simple comparisons —
    * which, unlike the equivalent NOT(COALESCE(...)) form, PUSHES DOWN
    * to the parquet scan (row-group stats skip wholly-conforming
    * groups — the shape that matters when auditing 100 TB for a
    * handful of violations). One codegen'd scan, no shuffle.
    */
  def checkViolations(df: DataFrame,
      check: Seq[Seq[graft.lang.Ast.CheckCmp]]): DataFrame = {
    require(check.nonEmpty && check.forall(_.nonEmpty),
      "CHECK requires at least one comparison")
    df.filter(check
      .map(conj => conj.map(complementColumn).reduce(_ || _))
      .reduce(_ && _))
  }
}
