package graft.lang

import Ast._

final case class ParseError(msg: String, line: Int, col: Int)
  extends RuntimeException(s"$msg at $line:$col")

/** Recursive-descent parser for the grapho language (reference:
  * /root/reference/parser/parser.go — same grammar, new implementation).
  * Keywords are contextual uppercase checks on IDENT tokens, mirroring
  * the reference's keyword table (keywords.go).
  */
final class Parser(tokens: Vector[Token]) {
  private var i = 0
  private def tok: Token = tokens(i)
  private def next(): Token = { val t = tok; if (t.kind != Tok.EOF) i += 1; t }

  private def err(msg: String): Nothing = throw ParseError(msg, tok.line, tok.col)

  // a backtick-quoted identifier is never a keyword: `where` is a name
  private def isKw(k: String): Boolean =
    tok.kind == Tok.IDENT && !tok.quoted && tok.kw == k
  private def matchKw(k: String): Boolean = { if (isKw(k)) { next(); true } else false }
  private def expectKw(k: String): Token =
    if (isKw(k)) next() else err(s"expected $k, found '${tok.lit}'")
  private def matchTok(k: Tok.Tok): Boolean = { if (tok.kind == k) { next(); true } else false }
  private def expect(k: Tok.Tok): Token =
    if (tok.kind == k) next() else err(s"expected $k, found '${tok.lit}'")

  /** Reserved words that cannot be bare identifiers (the reference's
    * lexer keyword table, keywords.go, makes type names keywords
    * everywhere). Backtick-quoting is the escape hatch.
    */
  private val typeKeywords = Set("STRING", "TEXT", "INT", "FLOAT", "BOOL", "UUID",
    "DATE", "TIME", "DATETIME", "JSON", "BLOB", "ARRAY", "ENUM")

  /** The reference additionally reserves INDEX, ON, and TYPE in its
    * lexer keyword table (keywords.go:24-26,32) — its lexer would
    * tokenize a bare `index` as a keyword, never an identifier. graft
    * matches: these reject in identifier positions too (and INDEX is
    * grammared as a field option, the way CHECK/SHOW/DESCRIBE were
    * completed).
    *
    * BREAKING MIGRATION NOTE (r12→): WALs or catalog DDL logs written
    * BEFORE these words were reserved may contain fields named
    * index/on/type UNQUOTED (the old renderer only quoted Ast.reserved
    * members). Replaying such a log now fails with ParseError at the
    * offending statement rather than loading silently — rewrite the
    * log with the identifiers backtick-quoted (the current renderer
    * always emits them quoted, so logs written at or after r12 replay
    * cleanly). Matching the reference keyword table was judged worth
    * the one-time rewrite.
    */
  private val reservedNonType = Set("INDEX", "ON", "TYPE")

  private def expectIdent(): String = {
    if (tok.kind != Tok.IDENT) err(s"expected identifier, found '${tok.lit}'")
    if (tok.quoted && tok.lit.isEmpty) err("empty quoted identifier")
    if (!tok.quoted && typeKeywords.contains(tok.kw))
      err(s"'${tok.lit}' is a reserved type name; quote it with backticks to use as an identifier")
    if (!tok.quoted && reservedNonType.contains(tok.kw))
      err(s"'${tok.lit}' is a reserved word; quote it with backticks to use as an identifier")
    next().lit
  }

  def parseScript(): Seq[Stmt] = {
    val out = Seq.newBuilder[Stmt]
    while (tok.kind != Tok.EOF) {
      if (matchTok(Tok.SEMI)) () // empty statement
      else {
        out += parseStmt()
        if (tok.kind != Tok.EOF) expect(Tok.SEMI)
      }
    }
    out.result()
  }

  def parseStmt(): Stmt = {
    if (matchKw("CREATE")) parseCreate()
    else if (matchKw("ALTER")) parseAlter()
    else if (matchKw("DROP")) parseDrop()
    else if (matchKw("INSERT")) parseInsert()
    else if (matchKw("UPDATE")) parseUpdate()
    else if (matchKw("DELETE")) parseDelete()
    else if (matchKw("MATCH")) parseMatch()
    else if (matchKw("SHOW")) parseShow()
    else if (matchKw("DESCRIBE")) parseDescribe()
    else err(s"expected statement, found '${tok.lit}'")
  }

  // SHOW/DESCRIBE: keywords the reference reserves (keywords.go:30-31)
  // without a grammar — graft completes the introspection surface
  private def parseShow(): Stmt =
    if (matchKw("NODES")) Show(edges = false)
    else if (matchKw("EDGES")) Show(edges = true)
    else err("expected NODES or EDGES after SHOW")

  private def parseDescribe(): Stmt =
    if (matchKw("NODE")) Describe(edge = false, expectIdent())
    else if (matchKw("EDGE")) Describe(edge = true, expectIdent())
    else err("expected NODE or EDGE after DESCRIBE")

  // ------------------------------------------------------------- CREATE

  private def parseCreate(): Stmt =
    if (matchKw("NODE")) {
      val name = expectIdent()
      expect(Tok.LPAREN)
      val fields = Seq.newBuilder[FieldDef]
      if (tok.kind != Tok.RPAREN) {
        var more = true
        while (more) {
          fields += parseFieldDef()
          more = matchTok(Tok.COMMA) && tok.kind != Tok.RPAREN
        }
      }
      expect(Tok.RPAREN)
      CreateNode(name, fields.result())
    } else if (matchKw("EDGE")) {
      val name = expectIdent()
      expect(Tok.LPAREN)
      expectKw("FROM")
      val from = parseEndpoint()
      expect(Tok.COMMA)
      expectKw("TO")
      val to = parseEndpoint()
      val props = Seq.newBuilder[FieldDef]
      if (matchTok(Tok.COMMA)) {
        expectKw("PROPS")
        expect(Tok.LPAREN)
        if (tok.kind != Tok.RPAREN) {
          var more = true
          while (more) {
            props += parseFieldDef()
            more = matchTok(Tok.COMMA) && tok.kind != Tok.RPAREN
          }
        }
        expect(Tok.RPAREN)
      }
      expect(Tok.RPAREN)
      CreateEdge(name, from, to, props.result())
    } else err("expected NODE or EDGE after CREATE")

  private def parseEndpoint(): Endpoint = {
    val label = expectIdent()
    val card =
      if (matchKw("ONE")) Cardinality.One
      else if (matchKw("MANY")) Cardinality.Many
      else Cardinality.One
    Endpoint(label, card)
  }

  private def parseFieldDef(): FieldDef = {
    val name = expectIdent()
    expect(Tok.COLON)
    val tpe = parseTypeSpec()
    var fd = FieldDef(name, tpe)
    var more = true
    while (more) {
      if (matchKw("PRIMARY")) { expectKw("KEY"); fd = fd.copy(primaryKey = true) }
      else if (matchKw("UNIQUE")) fd = fd.copy(unique = true)
      else if (matchKw("INDEX")) fd = fd.copy(index = true)
      else if (matchKw("NOT")) {
        if (tok.kind == Tok.NULLLIT) next() else expectKw("NULL")
        fd = fd.copy(notNull = true)
      }
      else if (matchKw("DEFAULT")) fd = fd.copy(default = Some(parseLiteral()))
      else if (matchKw("CHECK")) {
        expect(Tok.LPAREN)
        // DNF with standard precedence (AND binds tighter than OR):
        // expr := conj (OR conj)* ; conj := atom (AND atom)*
        val disj = Seq.newBuilder[Seq[CheckCmp]]
        def conj(): Seq[CheckCmp] = {
          val cmps = Seq.newBuilder[CheckCmp]
          cmps += parseCheckCmp()
          while (matchKw("AND")) cmps += parseCheckCmp()
          cmps.result()
        }
        disj += conj()
        while (matchKw("OR")) disj += conj()
        expect(Tok.RPAREN)
        fd = fd.copy(check = disj.result())
      }
      else more = false
    }
    fd
  }

  /** One CHECK atom: `field op literal` or `field op siblingField`
    * (op ∈ = != < <= > >=). An IDENT after the operator is a sibling
    * field reference — unambiguous, since true/false/null lex as
    * literal tokens.
    */
  private def parseCheckCmp(): CheckCmp = {
    val f = expectIdent()
    val op = tok.kind match {
      case Tok.EQ => next(); CmpOp.Eq
      case Tok.NEQ => next(); CmpOp.Ne
      case Tok.LT => next(); CmpOp.Lt
      case Tok.LE => next(); CmpOp.Le
      case Tok.GT => next(); CmpOp.Gt
      case Tok.GE => next(); CmpOp.Ge
      case _ => err(s"expected comparison operator, found '${tok.lit}'")
    }
    if (tok.kind == Tok.IDENT)
      CheckCmp(f, op, Literal(LitKind.Null, "null"), rhsField = Some(expectIdent()))
    else CheckCmp(f, op, parseLiteral())
  }

  private def parseTypeSpec(): TypeSpec = {
    if (tok.kind != Tok.IDENT || tok.quoted) err(s"expected type, found '${tok.lit}'")
    val kw = next().kw
    kw match {
      case "STRING" => TypeSpec(Base.Str)
      case "TEXT" => TypeSpec(Base.Text)
      case "INT" => TypeSpec(Base.Int)
      case "FLOAT" => TypeSpec(Base.Float)
      case "BOOL" => TypeSpec(Base.Bool)
      case "UUID" => TypeSpec(Base.Uuid)
      case "DATE" => TypeSpec(Base.Date)
      case "TIME" => TypeSpec(Base.Time)
      case "DATETIME" => TypeSpec(Base.DateTime)
      case "JSON" => TypeSpec(Base.Json)
      case "BLOB" => TypeSpec(Base.Blob)
      case "ARRAY" =>
        expect(Tok.LT)
        val elem = parseTypeSpec()
        expect(Tok.GT)
        TypeSpec(Base.Str, elem = Some(elem))
      case "ENUM" =>
        expect(Tok.LT)
        val vals = Seq.newBuilder[String]
        vals += expect(Tok.STRINGLIT).lit
        while (matchTok(Tok.COMMA)) vals += expect(Tok.STRINGLIT).lit
        expect(Tok.GT)
        TypeSpec(Base.Str, enumVals = vals.result())
      case other => err(s"expected type, found '$other'")
    }
  }

  private def parseLiteral(): Literal = tok.kind match {
    case Tok.STRINGLIT => Literal(LitKind.Str, next().lit)
    case Tok.NUMBER => Literal(LitKind.Num, next().lit)
    case Tok.BOOLLIT => Literal(LitKind.Bool, next().lit)
    case Tok.NULLLIT => next(); Literal(LitKind.Null, "null")
    case _ => err(s"expected literal, found '${tok.lit}'")
  }

  // -------------------------------------------------------------- ALTER

  private def parseAlter(): Stmt =
    if (matchKw("NODE")) {
      val name = expectIdent()
      val action: AlterNodeAction =
        if (matchKw("ADD")) AlterNodeAction.AddField(parseFieldDef())
        else if (matchKw("DROP")) AlterNodeAction.DropField(expectIdent())
        else if (matchKw("MODIFY")) AlterNodeAction.ModifyField(parseFieldDef())
        else if (matchKw("SET")) {
          expectKw("PRIMARY"); expectKw("KEY"); expect(Tok.LPAREN)
          val fs = Seq.newBuilder[String]
          fs += expectIdent()
          while (matchTok(Tok.COMMA)) fs += expectIdent()
          expect(Tok.RPAREN)
          AlterNodeAction.SetPrimaryKey(fs.result())
        }
        else err("expected ADD, DROP, MODIFY, or SET after ALTER NODE")
      AlterNode(name, action)
    } else if (matchKw("EDGE")) {
      val name = expectIdent()
      val action: AlterEdgeAction =
        if (matchKw("ADD")) AlterEdgeAction.AddProp(parseFieldDef())
        else if (matchKw("DROP")) AlterEdgeAction.DropProp(expectIdent())
        else if (matchKw("MODIFY")) AlterEdgeAction.ModifyProp(parseFieldDef())
        else if (matchKw("SET")) {
          expectKw("FROM")
          val from = parseEndpoint()
          expectKw("TO")
          val to = parseEndpoint()
          AlterEdgeAction.SetEndpoints(from, to)
        }
        else err("expected ADD, DROP, MODIFY, or SET after ALTER EDGE")
      AlterEdge(name, action)
    } else err("expected NODE or EDGE after ALTER")

  private def parseDrop(): Stmt =
    if (matchKw("NODE")) DropNode(expectIdent())
    else if (matchKw("EDGE")) DropEdge(expectIdent())
    else err("expected NODE or EDGE after DROP")

  // ---------------------------------------------------------------- DML

  private def parsePropertyList(): Seq[Property] = {
    val out = Seq.newBuilder[Property]
    var more = true
    while (more) {
      val name = expectIdent()
      expect(Tok.COLON)
      out += Property(name, parseLiteral())
      more = matchTok(Tok.COMMA)
    }
    out.result()
  }

  private def parseNodeRef(): NodeRef = {
    val tpe = expectIdent()
    if (matchTok(Tok.LPAREN)) {
      val ref =
        if (tok.kind == Tok.NUMBER || tok.kind == Tok.STRINGLIT)
          NodeRef(tpe, Some(parseLiteral()), Nil)
        else NodeRef(tpe, None, parsePropertyList())
      expect(Tok.RPAREN)
      ref
    } else NodeRef(tpe, None, Nil)
  }

  private def parseInsert(): Stmt =
    if (matchKw("NODE")) {
      val tpe = expectIdent()
      val props = if (matchTok(Tok.LPAREN)) {
        val p = parsePropertyList(); expect(Tok.RPAREN); p
      } else Nil
      InsertNode(tpe, props)
    } else if (matchKw("EDGE")) {
      val tpe = expectIdent()
      expectKw("FROM")
      val from = parseNodeRef()
      expectKw("TO")
      val to = parseNodeRef()
      val props = if (matchTok(Tok.LPAREN)) {
        val p = parsePropertyList(); expect(Tok.RPAREN); p
      } else Nil
      InsertEdge(tpe, from, to, props)
    } else err("expected NODE or EDGE after INSERT")

  private def parseUpdate(): Stmt = {
    val isNode =
      if (matchKw("NODE")) true
      else if (matchKw("EDGE")) false
      else err("expected NODE or EDGE after UPDATE")
    val tpe = expectIdent()
    expectKw("SET")
    val set = parsePropertyList()
    val where = if (matchKw("WHERE")) parsePropertyList() else Nil
    if (isNode) UpdateNode(tpe, set, where) else UpdateEdge(tpe, set, where)
  }

  private def parseDelete(): Stmt = {
    val isNode =
      if (matchKw("NODE")) true
      else if (matchKw("EDGE")) false
      else err("expected NODE or EDGE after DELETE")
    val tpe = expectIdent()
    // WHERE is optional, matching the reference (dml_test.go "DELETE
    // NODE User;"): an absent clause deletes every row of the label
    val where = if (matchKw("WHERE")) parsePropertyList() else Nil
    if (isNode) DeleteNode(tpe, where) else DeleteEdge(tpe, where)
  }

  private val stmtKeywords = Set("WHERE", "RETURN")

  // quoted identifiers are never clause keywords here either: a node
  // type named `where` (backtick-quoted) starts a pattern element
  private def startsElement: Boolean =
    tok.kind == Tok.IDENT && (tok.quoted || !stmtKeywords(tok.kw))

  private def parseMatch(): Stmt = {
    val pattern = Seq.newBuilder[MatchElement]
    var more = startsElement
    while (more) {
      val tpe = next().lit
      val alias = if (startsElement) Some(next().lit) else None
      pattern += MatchElement(tpe, alias)
      more = matchTok(Tok.COMMA)
    }
    val where = if (matchKw("WHERE")) parsePropertyList() else Nil
    val ret = if (matchKw("RETURN")) {
      val out = Seq.newBuilder[String]
      out += expectIdent()
      while (matchTok(Tok.COMMA)) out += expectIdent()
      out.result()
    } else Nil
    Match(pattern.result(), where, ret)
  }
}

object Parser {
  def parse(script: String): Seq[Stmt] =
    new Parser(new Lexer(script).tokenize()).parseScript()
}
