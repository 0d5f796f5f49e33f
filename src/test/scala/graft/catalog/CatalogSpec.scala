package graft.catalog

import graft.lang.{Ast, Parser}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  private def applyScript(script: String, from: GraphCatalog = GraphCatalog.empty) =
    Parser.parse(script).foldLeft(from)(Ddl.apply)

  test("create node/edge builds typed defs and bumps version") {
    val cat = applyScript(
      """CREATE NODE Person (id: int PRIMARY KEY, name: string NOT NULL, bal: float DEFAULT 0);
        |CREATE NODE City (name: string);
        |CREATE EDGE LivesIn (FROM Person MANY, TO City ONE, PROPS (since: date));""".stripMargin)
    assert(cat.version === 3)
    val p = cat.nodes("Person")
    assert(p.pk === Seq("id"))
    assert(p.field("id").get.notNull) // pk implies not null
    assert(p.field("bal").get.defaultRaw === Some("0"))
    val e = cat.edges("LivesIn")
    assert(e.from === EndpointDef("Person", many = true))
    assert(e.to === EndpointDef("City", many = false))
    assert(e.prop("since").get.tpe.base === Ast.Base.Date)
  }

  test("type mapping covers the full reference type system") {
    val cat = applyScript(
      """CREATE NODE T (a: string, b: text, c: int, d: float, e: bool, f: uuid,
        |  g: date, h: time, i: datetime, j: json, k: blob,
        |  l: array<int>, m: enum<'x','y'>);""".stripMargin)
    val schema = Types.toSchema(cat.nodes("T").fields)
    val m = schema.fields.map(f => f.name -> f.dataType).toMap
    assert(m("a") === StringType && m("b") === StringType)
    assert(m("c") === LongType && m("d") === DoubleType && m("e") === BooleanType)
    assert(m("f") === StringType && m("g") === DateType && m("h") === StringType)
    assert(m("i") === TimestampType && m("j") === StringType && m("k") === BinaryType)
    assert(m("l") === ArrayType(LongType))
    assert(m("m") === StringType)
  }

  test("alter node add/drop/modify/set-pk and edge set-endpoints") {
    val cat = applyScript(
      """CREATE NODE P (id: int PRIMARY KEY, name: string);
        |CREATE NODE Q (id: int);
        |CREATE EDGE E (FROM P ONE, TO P ONE);
        |ALTER NODE P ADD email: string UNIQUE;
        |ALTER NODE P MODIFY name: text NOT NULL;
        |ALTER NODE P SET PRIMARY KEY (id, email);
        |ALTER EDGE E ADD w: float;
        |ALTER EDGE E SET FROM Q MANY TO P MANY;
        |ALTER EDGE E DROP w;
        |ALTER NODE P DROP name;""".stripMargin)
    val p = cat.nodes("P")
    assert(p.field("email").get.unique)
    assert(p.field("name").isEmpty)
    assert(p.pk === Seq("id", "email"))
    val e = cat.edges("E")
    assert(e.from.label === "Q" && e.from.many)
    assert(e.props.isEmpty)
    assert(cat.version === 10)
  }

  test("validation: duplicates, unknown labels, pk protection, drop-in-use") {
    val base = applyScript("CREATE NODE P (id: int PRIMARY KEY); CREATE NODE Q (id: int);")
    assertThrows[DdlError](applyScript("CREATE NODE P (x: int);", base))
    assertThrows[DdlError](applyScript("CREATE NODE R (x: int, x: float);", base))
    assertThrows[DdlError](applyScript("CREATE EDGE E (FROM P ONE, TO Nope ONE);", base))
    assertThrows[DdlError](applyScript("ALTER NODE P DROP id;", base)) // pk field
    assertThrows[DdlError](applyScript("ALTER NODE Nope ADD x: int;", base))
    val withEdge = applyScript("CREATE EDGE E (FROM P ONE, TO Q ONE);", base)
    assertThrows[DdlError](applyScript("DROP NODE P;", withEdge)) // in use
    assert(applyScript("DROP EDGE E; DROP NODE P;", withEdge).nodes.keySet === Set("Q"))
  }

  test("validation mirrors reference ddl.go field sanity rules") {
    val base = applyScript("CREATE NODE P (id: int PRIMARY KEY); CREATE NODE Q (id: int);")
    // at least one field (validateCreateNode)
    assertThrows[DdlError](applyScript("CREATE NODE R ();", base))
    // one inline PRIMARY KEY max; composite keys go via ALTER ... SET
    assertThrows[DdlError](
      applyScript("CREATE NODE R (a: int PRIMARY KEY, b: int PRIMARY KEY);", base))
    // primary key must be scalar (no array/enum/json/blob)
    assertThrows[DdlError](applyScript("CREATE NODE R (a: array<int> PRIMARY KEY);", base))
    assertThrows[DdlError](applyScript("CREATE NODE R (a: json PRIMARY KEY);", base))
    // NOT NULL cannot default to null, in CREATE and in ALTER paths
    assertThrows[DdlError](
      applyScript("CREATE NODE R (a: int NOT NULL DEFAULT null);", base))
    assertThrows[DdlError](applyScript("ALTER NODE P ADD b: int NOT NULL DEFAULT null;", base))
    val withEdge = applyScript("CREATE EDGE E (FROM P ONE, TO Q ONE);", base)
    assertThrows[DdlError](
      applyScript("ALTER EDGE E ADD w: int NOT NULL DEFAULT null;", withEdge))
    // duplicate edge props rejected
    assertThrows[DdlError](applyScript(
      "CREATE EDGE F (FROM P ONE, TO Q ONE, PROPS (x: int, x: float));", base))
    // valid composite key path still works
    val multi = applyScript("ALTER NODE Q ADD name: string; ALTER NODE Q SET PRIMARY KEY (id, name);", base)
    assert(multi.nodes("Q").pk === Seq("id", "name"))
    // SET PRIMARY KEY enforces scalar key fields too
    assertThrows[DdlError](applyScript(
      "ALTER NODE Q ADD tags: array<string>; ALTER NODE Q SET PRIMARY KEY (tags);", base))
  }

  test("scripted INDEX folds into the label layout (bucket head, sort tail)") {
    val cat = applyScript(
      "CREATE NODE T (k: int PRIMARY KEY INDEX, v: string INDEX, w: float);")
    val nt = cat.nodes("T")
    assert(nt.field("k").get.index && nt.field("v").get.index)
    assert(nt.layout === LayoutSpec(
      bucketBy = Some((Ddl.IndexBuckets, Seq("k"))), sortBy = Seq("v")))
    // ALTER adding an index migrates the layout; dropping the last
    // indexed field clears it (and never leaves a ghost column)
    val more = applyScript("ALTER NODE T ADD j: int INDEX;", cat)
    assert(more.nodes("T").layout.sortBy === Seq("v", "j"))
    val fewer = applyScript(
      "ALTER NODE T DROP k; ALTER NODE T DROP v; ALTER NODE T DROP j;",
      applyScript("ALTER NODE T SET PRIMARY KEY (w);", more))
    assert(fewer.nodes("T").layout === LayoutSpec())
    // edge props index the same way
    val withEdge = applyScript(
      "CREATE NODE Q (id: int); CREATE EDGE E (FROM T ONE, TO Q ONE, PROPS (s: int INDEX));", cat)
    assert(withEdge.edges("E").layout.bucketBy ===
      Some((Ddl.IndexBuckets, Seq("s"))))
  }

  test("DDL-time CHECK validation rejects unenforceable constraints up front") {
    // referenced sibling must exist
    assertThrows[DdlError](applyScript(
      "CREATE NODE P (a: float CHECK (a > 0.0 AND missing < 5));"))
    // literal must be type-compatible with the referenced field
    assertThrows[DdlError](applyScript(
      "CREATE NODE P (a: string CHECK (a > 5));"))
    assertThrows[DdlError](applyScript(
      "CREATE NODE P (a: int CHECK (a = 'x'));"))
    assertThrows[DdlError](applyScript(
      "CREATE NODE P (a: bool CHECK (a = 1));"))
    // unsupported (non-comparable) field types reject
    assertThrows[DdlError](applyScript(
      "CREATE NODE P (a: blob CHECK (a != 'x'));"))
    assertThrows[DdlError](applyScript(
      "CREATE NODE P (a: array<int>, b: int CHECK (a = 1));"))
    // date/timestamp literals must parse
    assertThrows[DdlError](applyScript(
      "CREATE NODE P (d: date CHECK (d >= 'not-a-date'));"))
    assert(applyScript(
      "CREATE NODE P (d: date CHECK (d >= '1995-01-01'));")
      .nodes("P").field("d").get.check.nonEmpty)
    // the shared lexical rule: a fractional literal against an int
    // field is VALID (compares as double at insert and in the finder)
    assert(applyScript("CREATE NODE P (q: int CHECK (q < 4.5));")
      .nodes("P").field("q").get.check.nonEmpty)
    // a DROP that orphans another field's CHECK reference rejects
    val base = applyScript(
      "CREATE NODE P (a: int, b: float CHECK (a > 0));")
    assertThrows[DdlError](applyScript("ALTER NODE P DROP a;", base))
    // ALTER ADD with a bad check rejects the same way
    assertThrows[DdlError](applyScript(
      "ALTER NODE P ADD c: int CHECK (nope = 1);", base))
  }
}
