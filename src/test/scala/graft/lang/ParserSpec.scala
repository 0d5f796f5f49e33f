package graft.lang

import org.scalatest.funsuite.AnyFunSuite
import Ast._

class ParserSpec extends AnyFunSuite {

  /** The reference README "Playing around" script, verbatim. */
  val readmeScript: String =
    """CREATE NODE Person (name: string, age: int);
      |CREATE NODE Place (name: string);
      |CREATE EDGE Knows (FROM Person ONE, TO Person MANY);
      |CREATE EDGE LivesIn (FROM Person ONE, TO Place ONE);
      |
      |INSERT NODE Person (name: "John", age: 30);
      |INSERT NODE Person (name: "Jane", age: 25);
      |INSERT NODE Place (name: "New York");
      |INSERT NODE Place (name: "Los Angeles");
      |
      |MATCH Person WHERE name: "John";
      |""".stripMargin

  test("parses the reference README script") {
    val stmts = Parser.parse(readmeScript)
    assert(stmts.length === 9)
    assert(stmts(0) === CreateNode("Person", Seq(
      FieldDef("name", TypeSpec(Base.Str)), FieldDef("age", TypeSpec(Base.Int)))))
    assert(stmts(2) === CreateEdge("Knows",
      Endpoint("Person", Cardinality.One), Endpoint("Person", Cardinality.Many), Nil))
    assert(stmts(4) === InsertNode("Person", Seq(
      Property("name", Literal(LitKind.Str, "John")),
      Property("age", Literal(LitKind.Num, "30")))))
    assert(stmts(8) === Match(Seq(MatchElement("Person", None)),
      Seq(Property("name", Literal(LitKind.Str, "John"))), Nil))
  }

  test("parses full field options, enum/array types, edge props") {
    val Seq(cn) = Parser.parse(
      """CREATE NODE Doc (
        |  id: int PRIMARY KEY,
        |  title: string UNIQUE NOT NULL DEFAULT 'untitled',
        |  tags: array<string>,
        |  status: enum<'draft', 'final'>,
        |  meta: json, body: text, created: datetime, day: date,
        |  t: time, u: uuid, raw: blob, score: float, ok: bool
        |);""".stripMargin)
    val cnStmt = cn.asInstanceOf[CreateNode]
    val byName = cnStmt.fields.map(f => f.name -> f).toMap
    assert(byName("id").primaryKey)
    assert(byName("title").unique && byName("title").notNull &&
      byName("title").default === Some(Literal(LitKind.Str, "untitled")))
    assert(byName("tags").tpe.elem === Some(TypeSpec(Base.Str)))
    assert(byName("status").tpe.enumVals === Seq("draft", "final"))
    assert(byName("created").tpe.base === Base.DateTime)

    val Seq(ce) = Parser.parse(
      "CREATE EDGE Rated (FROM Person MANY, TO Doc MANY, PROPS (stars: int NOT NULL, note: string));")
    val e = ce.asInstanceOf[CreateEdge]
    assert(e.props.map(_.name) === Seq("stars", "note"))
    assert(e.props.head.notNull)
  }

  test("parses ALTER statements") {
    val stmts = Parser.parse(
      """ALTER NODE Person ADD email: string UNIQUE;
        |ALTER NODE Person DROP age;
        |ALTER NODE Person MODIFY name: text;
        |ALTER NODE Person SET PRIMARY KEY (name, email);
        |ALTER EDGE Knows ADD since: date;
        |ALTER EDGE Knows DROP since;
        |ALTER EDGE Knows SET FROM Person MANY TO Person MANY;
        |DROP NODE Place;
        |DROP EDGE Knows;""".stripMargin)
    assert(stmts(0) === AlterNode("Person",
      AlterNodeAction.AddField(FieldDef("email", TypeSpec(Base.Str), unique = true))))
    assert(stmts(1) === AlterNode("Person", AlterNodeAction.DropField("age")))
    assert(stmts(3) === AlterNode("Person",
      AlterNodeAction.SetPrimaryKey(Seq("name", "email"))))
    assert(stmts(6) === AlterEdge("Knows", AlterEdgeAction.SetEndpoints(
      Endpoint("Person", Cardinality.Many), Endpoint("Person", Cardinality.Many))))
    assert(stmts(8) === DropEdge("Knows"))
  }

  test("parses DML: insert edge refs, update, delete") {
    val stmts = Parser.parse(
      """INSERT EDGE Knows FROM Person ('John') TO Person (name: 'Jane') (since: '2020-01-01');
        |INSERT EDGE Knows FROM Person (42) TO Person (43);
        |UPDATE NODE Person SET age: 31 WHERE name: 'John';
        |UPDATE EDGE Knows SET weight: 0.5;
        |DELETE NODE Person WHERE name: 'Jane';
        |DELETE EDGE Knows WHERE since: null;""".stripMargin)
    val ie = stmts(0).asInstanceOf[InsertEdge]
    assert(ie.from === NodeRef("Person", Some(Literal(LitKind.Str, "John")), Nil))
    assert(ie.to === NodeRef("Person", None,
      Seq(Property("name", Literal(LitKind.Str, "Jane")))))
    val ie2 = stmts(1).asInstanceOf[InsertEdge]
    assert(ie2.from.id === Some(Literal(LitKind.Num, "42")))
    val up = stmts(2).asInstanceOf[UpdateNode]
    assert(up.set === Seq(Property("age", Literal(LitKind.Num, "31"))))
    assert(up.where === Seq(Property("name", Literal(LitKind.Str, "John"))))
    assert(stmts(5).asInstanceOf[DeleteEdge].where.head.value.kind === LitKind.Null)
  }

  test("comments, quoted identifiers, escaped quotes, match return") {
    val stmts = Parser.parse(
      """-- a comment
        |/* block
        |   comment */
        |CREATE NODE `Weird Name` (x: int);
        |INSERT NODE `Weird Name` (x: 1);
        |MATCH `Weird Name` w WHERE x: 1 RETURN x;
        |INSERT NODE `Weird Name` (x: 2); -- trailing
        |""".stripMargin)
    assert(stmts(0).asInstanceOf[CreateNode].name === "Weird Name")
    val m = stmts(2).asInstanceOf[Match]
    assert(m.pattern === Seq(MatchElement("Weird Name", Some("w"))))
    assert(m.ret === Seq("x"))
    assert(Parser.parse("INSERT NODE P (s: 'it''s');")
      .head.asInstanceOf[InsertNode].properties.head.value.text === "it's")
  }

  test("trailing commas, empty field lists, no-WHERE match (reference parser_test.go parity)") {
    // reference TestTrailingCommasAndEmptyFields
    val stmts = Parser.parse(
      """CREATE NODE A();
        |CREATE NODE B(
        |  x: int,
        |);""".stripMargin)
    assert(stmts(0).asInstanceOf[CreateNode].fields.isEmpty)
    assert(stmts(1).asInstanceOf[CreateNode].fields.map(_.name) === Seq("x"))
    // reference TestMatchParsing "basic match"
    val Seq(m) = Parser.parse("MATCH User RETURN name;")
    assert(m === Match(Seq(MatchElement("User", None)), Nil, Seq("name")))
    val Seq(m2) = Parser.parse("MATCH User WHERE age: 25 RETURN name, email;")
    assert(m2.asInstanceOf[Match].ret === Seq("name", "email"))
  }

  test("render round-trips every statement shape through the parser") {
    val scripts = Seq(
      readmeScript,
      """CREATE NODE Doc (id: int PRIMARY KEY, title: string UNIQUE NOT NULL DEFAULT 'x',
        |tags: array<string>, status: enum<'a','b'>, raw: blob);""".stripMargin,
      "CREATE EDGE R (FROM Person MANY, TO Doc MANY, PROPS (stars: int NOT NULL));",
      "ALTER NODE Person ADD email: string UNIQUE;",
      "ALTER NODE Person SET PRIMARY KEY (name, email);",
      "ALTER EDGE Knows SET FROM Person MANY TO Person MANY;",
      "DROP NODE Place; DROP EDGE Knows;",
      "INSERT EDGE Knows FROM Person ('Jo''s') TO Person (name: 'Jane') (since: '2020-01-01');",
      "UPDATE NODE Person SET age: 31 WHERE name: 'John';",
      "DELETE EDGE Knows WHERE since: null;",
      // reference dml_test.go: WHERE-less delete (and update) hit all rows
      "DELETE NODE Person;",
      "UPDATE NODE Person SET age: 0;",
      "MATCH `Weird Name` w WHERE x: 1 RETURN x, y;",
      // empty property lists and bare node refs
      "INSERT NODE P;",
      "INSERT EDGE K FROM Person TO Person;",
      // identifiers that collide with literal keywords must re-quote
      "CREATE NODE X (`null`: int, `true`: bool);",
      "INSERT NODE X (`null`: 1, `true`: false);",
      // introspection (reserved-but-ungrammared in the reference)
      "SHOW NODES; SHOW EDGES;",
      "DESCRIBE NODE Person; DESCRIBE EDGE `show`;")
    scripts.foreach { script =>
      val parsed = Parser.parse(script)
      val rendered = parsed.map(Ast.render).mkString("\n")
      assert(Parser.parse(rendered) === parsed, s"round-trip failed for:\n$rendered")
    }
  }

  test("rejects malformed statements") {
    assertThrows[ParseError](Parser.parse("CREATE TABLE x (a: int);"))
    assertThrows[ParseError](Parser.parse("CREATE NODE P (a: int"))
    assertThrows[ParseError](Parser.parse("INSERT NODE P (a 1);"))
    assertThrows[LexError](Parser.parse("INSERT NODE P (a: 'unterminated);"))
  }

  test("parses CHECK field constraints (all six operators, AND chains)") {
    val Seq(cn) = Parser.parse(
      """CREATE NODE Item (
        |  id: int PRIMARY KEY,
        |  qty: int NOT NULL CHECK (qty >= 0 AND qty < 100),
        |  price: float CHECK (price > 0.0),
        |  state: string CHECK (state != 'void' AND ok = true AND n <= 5)
        |);""".stripMargin)
    val byName = cn.asInstanceOf[CreateNode].fields.map(f => f.name -> f).toMap
    assert(byName("qty").check === Seq(Seq(
      CheckCmp("qty", CmpOp.Ge, Literal(LitKind.Num, "0")),
      CheckCmp("qty", CmpOp.Lt, Literal(LitKind.Num, "100")))))
    assert(byName("price").check === Seq(Seq(
      CheckCmp("price", CmpOp.Gt, Literal(LitKind.Num, "0.0")))))
    assert(byName("state").check === Seq(Seq(
      CheckCmp("state", CmpOp.Ne, Literal(LitKind.Str, "void")),
      CheckCmp("ok", CmpOp.Eq, Literal(LitKind.Bool, "true")),
      CheckCmp("n", CmpOp.Le, Literal(LitKind.Num, "5")))))
    // renders back to canonical text and re-parses to the same AST
    val again = Parser.parse(Ast.render(cn)).head
    assert(again === cn)
    // malformed CHECKs are rejected
    assertThrows[ParseError](Parser.parse("CREATE NODE P (a: int CHECK (a));"))
    assertThrows[ParseError](Parser.parse("CREATE NODE P (a: int CHECK (a > ));"))
    assertThrows[ParseError](Parser.parse("CREATE NODE P (a: int CHECK ());"))
  }

  test("type names are reserved identifiers unless backtick-quoted") {
    assertThrows[ParseError](Parser.parse("CREATE NODE P (int: string);"))
    val Seq(cn) = Parser.parse("CREATE NODE P (`int`: string);")
    assert(cn.asInstanceOf[CreateNode].fields.head.name === "int")
  }

  test("quoted statement keywords are identifiers, and re-quote on render") {
    // a node type / field named like a clause keyword is usable when
    // backtick-quoted; unquoted it still reads as the keyword
    val Seq(cn) = Parser.parse("CREATE NODE `where` (`return`: int, `set`: string);")
    assert(cn === CreateNode("where", Seq(
      FieldDef("return", TypeSpec(Base.Int)), FieldDef("set", TypeSpec(Base.Str)))))
    val Seq(m) = Parser.parse("MATCH `where` `return` WHERE `set`: 'x' RETURN `return`;")
    assert(m === Match(Seq(MatchElement("where", Some("return"))),
      Seq(Property("set", Literal(LitKind.Str, "x"))), Seq("return")))
    // renderer round-trip: keyword-spelled identifiers come back quoted
    Seq("CREATE NODE `where` (`return`: int);",
        "INSERT EDGE `from` FROM `node` (`to`: 1) TO `node` (`to`: 2);",
        "UPDATE NODE `update` SET `set`: 1 WHERE `where`: 2;",
        "MATCH `match`, `where` `w` WHERE `return`: 1 RETURN `return`;").foreach { s =>
      val parsed = Parser.parse(s)
      assert(Parser.parse(parsed.map(Ast.render).mkString("\n")) === parsed,
        s"keyword-identifier round-trip failed for: $s")
    }
  }

  test("INDEX / ON / TYPE are reserved words (reference keywords.go:24-26,32)") {
    // the reference lexer tokenizes these as keywords everywhere, so a
    // bare identifier spelled like one must reject — graft matches
    assertThrows[ParseError](Parser.parse("CREATE NODE P (index: int);"))
    assertThrows[ParseError](Parser.parse("CREATE NODE on (a: int);"))
    assertThrows[ParseError](Parser.parse("CREATE NODE P (type: string);"))
    // backtick-quoted they are plain identifiers again
    val stmts = Parser.parse("CREATE NODE `type` (`index`: int, `on`: string);")
    assert(stmts.head === CreateNode("type", Seq(
      FieldDef("index", TypeSpec(Base.Int)), FieldDef("on", TypeSpec(Base.Str)))))
    // the renderer quotes them, so the WAL round-trips identically
    assert(Ast.render(stmts.head) ===
      "CREATE NODE `type` (`index`: int, `on`: string);")
    assert(Parser.parse(stmts.map(Ast.render).mkString("\n")) === stmts)
  }

  test("INDEX field option parses, renders, and round-trips") {
    val Seq(cn) = Parser.parse(
      "CREATE NODE T (k: int PRIMARY KEY INDEX, v: string INDEX, w: float);")
    val fs = cn.asInstanceOf[CreateNode].fields
    assert(fs.map(f => f.name -> f.index) ===
      Seq("k" -> true, "v" -> true, "w" -> false))
    assert(Parser.parse(Ast.render(cn)).head === cn)
    // option order is free, as with the other field options
    val Seq(cn2) = Parser.parse("CREATE NODE T (k: int INDEX NOT NULL DEFAULT 1);")
    val f2 = cn2.asInstanceOf[CreateNode].fields.head
    assert(f2.index && f2.notNull && f2.default.contains(Literal(LitKind.Num, "1")))
    // and on edge props + ALTER, the same way
    val Seq(ae) = Parser.parse("ALTER NODE T ADD j: int INDEX;")
    assert(ae === AlterNode("T",
      AlterNodeAction.AddField(FieldDef("j", TypeSpec(Base.Int), index = true))))
    assert(Parser.parse(Ast.render(ae)).head === ae)
  }

  test("CHECK grammar breadth: OR with standard precedence, field-vs-field atoms") {
    val nullLit = Literal(LitKind.Null, "null")
    // AND binds tighter than OR: a OR b AND c = a OR (b AND c)
    val Seq(cn) = Parser.parse(
      "CREATE NODE T (a: int, b: int, c: float CHECK (a > 1 OR b < 2 AND c = a));")
    val f = cn.asInstanceOf[CreateNode].fields.find(_.name == "c").get
    assert(f.check === Seq(
      Seq(CheckCmp("a", CmpOp.Gt, Literal(LitKind.Num, "1"))),
      Seq(CheckCmp("b", CmpOp.Lt, Literal(LitKind.Num, "2")),
        CheckCmp("c", CmpOp.Eq, nullLit, rhsField = Some("a")))))
    // render round-trips the DNF (no parens needed in canonical form)
    assert(Ast.render(cn) ===
      "CREATE NODE T (a: int, b: int, c: float CHECK (a > 1 OR b < 2 AND c = a));")
    assert(Parser.parse(Ast.render(cn)).head === cn)
    // quoted keyword-spelled identifiers work as sibling refs too
    val Seq(cn2) = Parser.parse(
      "CREATE NODE T (`or`: int, x: int CHECK (x > `or`));")
    assert(cn2.asInstanceOf[CreateNode].fields(1).check ===
      Seq(Seq(CheckCmp("x", CmpOp.Gt, nullLit, rhsField = Some("or")))))
    assert(Parser.parse(Ast.render(cn2)).head === cn2)
    // malformed: dangling OR, empty disjunct
    assertThrows[ParseError](Parser.parse("CREATE NODE P (a: int CHECK (a > 1 OR));"))
    assertThrows[ParseError](Parser.parse("CREATE NODE P (a: int CHECK (OR a > 1));"))
  }
}
