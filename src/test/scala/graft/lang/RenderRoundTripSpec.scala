package graft.lang

import org.scalatest.funsuite.AnyFunSuite
import Ast._
import scala.util.Random

/** Randomized render↔parse round-trip: the commit log's correctness
  * rests on `Parser.parse(Ast.render(s)) == s` for EVERY statement the
  * parser can produce, not just the happy-path shapes. Generates
  * random ASTs (awkward identifiers, reserved-word collisions, quotes
  * in literals, empty lists) with fixed seeds.
  */
class RenderRoundTripSpec extends AnyFunSuite {

  private def ident(rnd: Random): String = rnd.nextInt(6) match {
    case 0 => "plain" + rnd.nextInt(100)
    case 1 => "Weird Name " + rnd.nextInt(10) // needs backticks
    case 2 => Seq("int", "string", "enum", "null", "true")(rnd.nextInt(5)) // reserved
    case 3 => "_under" + rnd.nextInt(10)
    case 4 => "MiXeD" + rnd.nextInt(10)
    case _ => "x" + rnd.nextInt(1000)
  }

  private def literal(rnd: Random): Literal = rnd.nextInt(4) match {
    // non-negative only: the language (like the reference lexer) has no
    // unary minus, so a negative Num literal is unreachable from parse
    case 0 => Literal(LitKind.Num, rnd.nextInt(2000).toString)
    case 1 => Literal(LitKind.Bool, if (rnd.nextBoolean()) "true" else "false")
    case 2 => Literal(LitKind.Null, "null")
    case _ =>
      val bases = Seq("abc", "it's", "two  spaces", "", "O''Hara", "tab\there")
      Literal(LitKind.Str, bases(rnd.nextInt(bases.size)))
  }

  private def typeSpec(rnd: Random): TypeSpec = rnd.nextInt(6) match {
    case 0 => TypeSpec(Base.Str)
    case 1 => TypeSpec(Base.Int)
    case 2 => TypeSpec(Base.DateTime)
    case 3 => TypeSpec(Base.Str, elem = Some(TypeSpec(Base.Float)))
    case 4 => TypeSpec(Base.Str, enumVals = Seq("a b", "c'd", "e"))
    case _ => TypeSpec(Base.Blob)
  }

  private val cmpOps =
    Seq(CmpOp.Eq, CmpOp.Ne, CmpOp.Lt, CmpOp.Le, CmpOp.Gt, CmpOp.Ge)

  private def checkAtom(rnd: Random): CheckCmp =
    if (rnd.nextInt(4) == 0)
      // field-vs-field atom: the literal is the canonical placeholder
      CheckCmp(ident(rnd), cmpOps(rnd.nextInt(cmpOps.size)),
        Literal(LitKind.Null, "null"), rhsField = Some(ident(rnd)))
    else CheckCmp(ident(rnd), cmpOps(rnd.nextInt(cmpOps.size)), literal(rnd))

  private def checkCmps(rnd: Random): Seq[Seq[CheckCmp]] =
    if (rnd.nextInt(4) != 0) Nil
    else Seq.fill(1 + rnd.nextInt(2))( // OR of ...
      Seq.fill(1 + rnd.nextInt(2))(checkAtom(rnd))) // ... ANDs

  private def fieldDef(rnd: Random): FieldDef =
    FieldDef(ident(rnd), typeSpec(rnd),
      primaryKey = rnd.nextInt(5) == 0, unique = rnd.nextInt(4) == 0,
      notNull = rnd.nextInt(3) == 0,
      default = if (rnd.nextInt(4) == 0) Some(literal(rnd)) else None,
      check = checkCmps(rnd))

  private def props(rnd: Random, min: Int = 0): Seq[Property] =
    Seq.fill(min + rnd.nextInt(3))(Property(ident(rnd), literal(rnd)))

  private def endpoint(rnd: Random): Endpoint =
    Endpoint(ident(rnd), if (rnd.nextBoolean()) Cardinality.One else Cardinality.Many)

  private def nodeRef(rnd: Random): NodeRef = rnd.nextInt(3) match {
    case 0 => NodeRef(ident(rnd), Some(Literal(LitKind.Num, rnd.nextInt(100).toString)), Nil)
    case 1 => NodeRef(ident(rnd), None, props(rnd, min = 1))
    case _ => NodeRef(ident(rnd), None, Nil)
  }

  private def stmt(rnd: Random): Stmt = rnd.nextInt(12) match {
    case 0 => CreateNode(ident(rnd), Seq.fill(rnd.nextInt(4))(fieldDef(rnd)))
    case 1 => CreateEdge(ident(rnd), endpoint(rnd), endpoint(rnd),
      Seq.fill(rnd.nextInt(3))(fieldDef(rnd)))
    case 2 => AlterNode(ident(rnd), rnd.nextInt(4) match {
      case 0 => AlterNodeAction.AddField(fieldDef(rnd))
      case 1 => AlterNodeAction.DropField(ident(rnd))
      case 2 => AlterNodeAction.ModifyField(fieldDef(rnd))
      case _ => AlterNodeAction.SetPrimaryKey(Seq.fill(1 + rnd.nextInt(2))(ident(rnd)))
    })
    case 3 => AlterEdge(ident(rnd), rnd.nextInt(4) match {
      case 0 => AlterEdgeAction.AddProp(fieldDef(rnd))
      case 1 => AlterEdgeAction.DropProp(ident(rnd))
      case 2 => AlterEdgeAction.ModifyProp(fieldDef(rnd))
      case _ => AlterEdgeAction.SetEndpoints(endpoint(rnd), endpoint(rnd))
    })
    case 4 => DropNode(ident(rnd))
    case 5 => DropEdge(ident(rnd))
    case 6 => InsertNode(ident(rnd), props(rnd))
    case 7 =>
      // a bare TO-ref followed by edge props is grammatically ambiguous
      // (the paren group binds to the node ref), so that AST shape is
      // unreachable from parse — require a non-bare TO-ref when props
      // are present
      val ps = props(rnd)
      val to = Iterator.continually(nodeRef(rnd))
        .find(r => ps.isEmpty || r.id.nonEmpty || r.properties.nonEmpty).get
      InsertEdge(ident(rnd), nodeRef(rnd), to, ps)
    case 8 => UpdateNode(ident(rnd), props(rnd, min = 1), props(rnd))
    case 9 => UpdateEdge(ident(rnd), props(rnd, min = 1), props(rnd))
    // DELETE requires WHERE (reference parser.go parseDeleteNode expects it)
    case 10 => DeleteNode(ident(rnd), props(rnd, min = 1))
    case _ => Match(Seq(MatchElement(ident(rnd), None)), props(rnd),
      Seq.fill(rnd.nextInt(3))(ident(rnd)))
  }

  test("500 random statements round-trip through render and parse") {
    val rnd = new Random(2024)
    (1 to 500).foreach { i =>
      val s = stmt(rnd)
      val rendered = Ast.render(s)
      val reparsed =
        try Parser.parse(rendered)
        catch { case e: Throwable =>
          fail(s"#$i failed to re-parse: $rendered\n  ast: $s\n  err: $e")
        }
      assert(reparsed === Seq(s), s"#$i mismatch for: $rendered")
    }
  }
}
