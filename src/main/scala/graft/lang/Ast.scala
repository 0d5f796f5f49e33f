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

  final case class FieldDef(name: String, tpe: TypeSpec,
      primaryKey: Boolean = false, unique: Boolean = false,
      notNull: Boolean = false, default: Option[Literal] = None)

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
}
