package graft.lang

/** AST of the grapho statement language (reference:
  * /root/reference/parser/ast.go — same surface, idiomatic Scala ADT).
  */
object Ast {

  sealed trait Base
  object Base {
    case object Str extends Base
    case object Text extends Base
    case object Int extends Base
    case object Float extends Base
    case object Bool extends Base
    case object Uuid extends Base
    case object Date extends Base
    case object Time extends Base
    case object DateTime extends Base
    case object Json extends Base
    case object Blob extends Base
  }

  /** array-ness carried by `elem`, enum-ness by non-empty `enumVals`,
    * matching the reference's encoding (parser/ast.go:24).
    */
  final case class TypeSpec(base: Base, elem: Option[TypeSpec] = None,
      enumVals: Seq[String] = Nil)

  sealed trait LitKind
  object LitKind {
    case object Str extends LitKind
    case object Num extends LitKind
    case object Bool extends LitKind
    case object Null extends LitKind
  }
  final case class Literal(kind: LitKind, text: String)

  /** Comparison operator of a CHECK constraint atom. */
  sealed abstract class CmpOp(val sym: String)
  object CmpOp {
    case object Eq extends CmpOp("=")
    case object Ne extends CmpOp("!=")
    case object Lt extends CmpOp("<")
    case object Le extends CmpOp("<=")
    case object Gt extends CmpOp(">")
    case object Ge extends CmpOp(">=")
  }

  /** One atom of a CHECK constraint: `field op literal`, or — with
    * `rhsField` set — `field op siblingField` (the literal is then a
    * placeholder and ignored). The reference RESERVES the CHECK keyword
    * (parser/keywords.go:18) but never grammars it; graft completes the
    * feature the way SHOW/DESCRIBE were completed. The full constraint
    * is a DISJUNCTION of conjunctions with standard precedence (AND
    * binds tighter than OR): `CHECK (a > 1 AND b < 2 OR c = d)` parses
    * as `(a>1 AND b<2) OR (c=d)`, carried as `Seq[Seq[CheckCmp]]` —
    * outer OR, inner AND. SQL semantics: a row violates iff the whole
    * expression evaluates to definite FALSE; NULL passes.
    */
  final case class CheckCmp(field: String, op: CmpOp, value: Literal,
      rhsField: Option[String] = None)

  /** `index` completes the reference's reserved-but-ungrammared INDEX
    * keyword (parser/keywords.go:24, catalog/types.go:66 IndexSpec) the
    * way CHECK/SHOW/DESCRIBE were completed: a field option that marks
    * the field indexed. The catalog maps indexed fields to the label's
    * physical LayoutSpec (bucket/sort), which the writer applies — the
    * Spark-first analogue of the reference's in-memory hash indexes.
    */
  final case class FieldDef(name: String, tpe: TypeSpec,
      primaryKey: Boolean = false, unique: Boolean = false,
      notNull: Boolean = false, default: Option[Literal] = None,
      check: Seq[Seq[CheckCmp]] = Nil, index: Boolean = false)

  sealed trait Cardinality
  object Cardinality {
    case object One extends Cardinality
    case object Many extends Cardinality
  }
  final case class Endpoint(label: String, card: Cardinality)

  final case class Property(name: String, value: Literal)

  /** Node reference in INSERT EDGE: by id literal or property match
    * (reference parser.go parseNodeRef).
    */
  final case class NodeRef(nodeType: String, id: Option[Literal],
      properties: Seq[Property])

  sealed trait Stmt
  final case class CreateNode(name: String, fields: Seq[FieldDef]) extends Stmt
  final case class CreateEdge(name: String, from: Endpoint, to: Endpoint,
      props: Seq[FieldDef]) extends Stmt

  sealed trait AlterNodeAction
  object AlterNodeAction {
    final case class AddField(field: FieldDef) extends AlterNodeAction
    final case class DropField(name: String) extends AlterNodeAction
    final case class ModifyField(field: FieldDef) extends AlterNodeAction
    final case class SetPrimaryKey(fields: Seq[String]) extends AlterNodeAction
  }
  final case class AlterNode(name: String, action: AlterNodeAction) extends Stmt

  sealed trait AlterEdgeAction
  object AlterEdgeAction {
    final case class AddProp(prop: FieldDef) extends AlterEdgeAction
    final case class DropProp(name: String) extends AlterEdgeAction
    final case class ModifyProp(prop: FieldDef) extends AlterEdgeAction
    final case class SetEndpoints(from: Endpoint, to: Endpoint) extends AlterEdgeAction
  }
  final case class AlterEdge(name: String, action: AlterEdgeAction) extends Stmt

  final case class DropNode(name: String) extends Stmt
  final case class DropEdge(name: String) extends Stmt

  final case class InsertNode(nodeType: String, properties: Seq[Property]) extends Stmt
  final case class InsertEdge(edgeType: String, from: NodeRef, to: NodeRef,
      properties: Seq[Property]) extends Stmt
  final case class UpdateNode(nodeType: String, set: Seq[Property],
      where: Seq[Property]) extends Stmt
  final case class UpdateEdge(edgeType: String, set: Seq[Property],
      where: Seq[Property]) extends Stmt
  final case class DeleteNode(nodeType: String, where: Seq[Property]) extends Stmt
  final case class DeleteEdge(edgeType: String, where: Seq[Property]) extends Stmt

  final case class MatchElement(tpe: String, alias: Option[String])
  final case class Match(pattern: Seq[MatchElement], where: Seq[Property],
      ret: Seq[String]) extends Stmt

  /** Catalog introspection. The reference RESERVES the SHOW and
    * DESCRIBE keywords (parser/token.go:44-45, keywords.go:30-31) but
    * never grammars them; graft completes the feature: SHOW NODES |
    * EDGES lists the catalog, DESCRIBE NODE|EDGE x returns the field
    * table. Read-only — never written to the commit log.
    */
  final case class Show(edges: Boolean) extends Stmt
  final case class Describe(edge: Boolean, name: String) extends Stmt

  // ------------------------------------------------------------ renderer

  /** Statement → canonical source text. Round-trips through the parser
    * (`Parser.parse(render(s)).head == s`, asserted in ParserSpec) —
    * the contract the commit log relies on: a logged statement replays
    * to the same AST.
    */
  def render(s: Stmt): String = s match {
    case CreateNode(n, fs) => s"CREATE NODE ${id(n)} (${fs.map(field).mkString(", ")});"
    case CreateEdge(n, f, t, ps) =>
      val props = if (ps.isEmpty) "" else s", PROPS (${ps.map(field).mkString(", ")})"
      s"CREATE EDGE ${id(n)} (FROM ${endpoint(f)}, TO ${endpoint(t)}$props);"
    case AlterNode(n, a) => a match {
      case AlterNodeAction.AddField(f) => s"ALTER NODE ${id(n)} ADD ${field(f)};"
      case AlterNodeAction.DropField(f) => s"ALTER NODE ${id(n)} DROP ${id(f)};"
      case AlterNodeAction.ModifyField(f) => s"ALTER NODE ${id(n)} MODIFY ${field(f)};"
      case AlterNodeAction.SetPrimaryKey(fs) =>
        s"ALTER NODE ${id(n)} SET PRIMARY KEY (${fs.map(id).mkString(", ")});"
    }
    case AlterEdge(n, a) => a match {
      case AlterEdgeAction.AddProp(p) => s"ALTER EDGE ${id(n)} ADD ${field(p)};"
      case AlterEdgeAction.DropProp(p) => s"ALTER EDGE ${id(n)} DROP ${id(p)};"
      case AlterEdgeAction.ModifyProp(p) => s"ALTER EDGE ${id(n)} MODIFY ${field(p)};"
      case AlterEdgeAction.SetEndpoints(f, t) =>
        s"ALTER EDGE ${id(n)} SET FROM ${endpoint(f)} TO ${endpoint(t)};"
    }
    case DropNode(n) => s"DROP NODE ${id(n)};"
    case DropEdge(n) => s"DROP EDGE ${id(n)};"
    case InsertNode(t, ps) =>
      val p = if (ps.isEmpty) "" else s" (${props(ps)})"
      s"INSERT NODE ${id(t)}$p;"
    case InsertEdge(t, f, to, ps) =>
      val p = if (ps.isEmpty) "" else s" (${props(ps)})"
      s"INSERT EDGE ${id(t)} FROM ${nodeRef(f)} TO ${nodeRef(to)}$p;"
    case UpdateNode(t, set, where) =>
      s"UPDATE NODE ${id(t)} SET ${props(set)}${whereClause(where)};"
    case UpdateEdge(t, set, where) =>
      s"UPDATE EDGE ${id(t)} SET ${props(set)}${whereClause(where)};"
    case DeleteNode(t, where) => s"DELETE NODE ${id(t)}${whereClause(where)};"
    case DeleteEdge(t, where) => s"DELETE EDGE ${id(t)}${whereClause(where)};"
    case Match(pat, where, ret) =>
      val p = pat.map(e => (Seq(id(e.tpe)) ++ e.alias.map(id)).mkString(" ")).mkString(", ")
      val r = if (ret.isEmpty) "" else s" RETURN ${ret.map(id).mkString(", ")}"
      s"MATCH $p${whereClause(where)}$r;"
    case Show(e) => s"SHOW ${if (e) "EDGES" else "NODES"};"
    case Describe(e, n) => s"DESCRIBE ${if (e) "EDGE" else "NODE"} ${id(n)};"
  }

  private val plainIdent = "[A-Za-z_][A-Za-z0-9_]*".r
  // type keywords (reserved in identifier positions), the literal words
  // (the lexer re-tokenizes them as BOOLLIT/NULLLIT), and every
  // statement/clause keyword: an identifier spelled like any of these
  // is backtick-quoted so the parser reads it back as a name, not a
  // keyword — the round-trip contract the commit log relies on
  private val reserved = Set("STRING", "TEXT", "INT", "FLOAT", "BOOL", "UUID",
    "DATE", "TIME", "DATETIME", "JSON", "BLOB", "ARRAY", "ENUM",
    "TRUE", "FALSE", "NULL",
    "CREATE", "ALTER", "DROP", "INSERT", "UPDATE", "DELETE", "MATCH",
    "NODE", "EDGE", "FROM", "TO", "ONE", "MANY", "PROPS",
    "PRIMARY", "KEY", "UNIQUE", "NOT", "DEFAULT", "CHECK", "AND", "OR",
    "ADD", "MODIFY", "SET", "WHERE", "RETURN",
    "SHOW", "DESCRIBE", "NODES", "EDGES",
    // the reference reserves these three in its lexer keyword table
    // (parser/keywords.go:24-26,32) even where its grammar never uses
    // them — graft matches, so identifier quoting round-trips identically
    "INDEX", "ON", "TYPE")
  private def id(n: String): String =
    if (plainIdent.matches(n) && !reserved.contains(n.toUpperCase)) n else s"`$n`"

  private def lit(l: Literal): String = l.kind match {
    case LitKind.Str => "'" + l.text.replace("'", "''") + "'"
    case _ => l.text
  }

  private def props(ps: Seq[Property]): String =
    ps.map(p => s"${id(p.name)}: ${lit(p.value)}").mkString(", ")

  private def whereClause(ps: Seq[Property]): String =
    if (ps.isEmpty) "" else s" WHERE ${props(ps)}"

  private def nodeRef(r: NodeRef): String =
    r.id.map(l => s"${id(r.nodeType)} (${lit(l)})").getOrElse {
      if (r.properties.isEmpty) id(r.nodeType)
      else s"${id(r.nodeType)} (${props(r.properties)})"
    }

  private def endpoint(e: Endpoint): String =
    s"${id(e.label)} ${if (e.card == Cardinality.Many) "MANY" else "ONE"}"

  /** Canonical source text of a type — the same form the parser reads
    * back; public for catalog introspection (DESCRIBE output).
    */
  def renderType(t: TypeSpec): String = tpe(t)

  private def tpe(t: TypeSpec): String = t match {
    case TypeSpec(_, Some(el), _) => s"array<${tpe(el)}>"
    case TypeSpec(_, _, vs) if vs.nonEmpty =>
      s"enum<${vs.map(v => "'" + v.replace("'", "''") + "'").mkString(", ")}>"
    case TypeSpec(b, _, _) => b match {
      case Base.Str => "string"
      case other => other.toString.toLowerCase
    }
  }

  /** Canonical CHECK body text (DNF, standard precedence — no parens
    * needed: OR joins conjunctions, AND joins atoms). Public: DESCRIBE
    * shares it, so introspection prints exactly the re-parsable form.
    */
  def renderCheck(check: Seq[Seq[CheckCmp]]): String =
    check.map(_.map(c => s"${id(c.field)} ${c.op.sym} " +
        c.rhsField.map(id).getOrElse(lit(c.value)))
      .mkString(" AND ")).mkString(" OR ")

  private def field(f: FieldDef): String = {
    val opts = (if (f.primaryKey) " PRIMARY KEY" else "") +
      (if (f.unique) " UNIQUE" else "") +
      (if (f.index) " INDEX" else "") +
      (if (f.notNull) " NOT NULL" else "") +
      f.default.map(d => s" DEFAULT ${lit(d)}").getOrElse("") +
      (if (f.check.isEmpty) ""
       else " CHECK (" + renderCheck(f.check) + ")")
    s"${id(f.name)}: ${tpe(f.tpe)}$opts"
  }
}
