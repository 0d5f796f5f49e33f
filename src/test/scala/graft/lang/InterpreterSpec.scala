package graft.lang

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InterpreterSpec extends SparkSpec {

  private def fresh() = new Interpreter(spark)

  test("README script end-to-end: DDL, inserts, match") {
    val it = fresh()
    val res = it.executeScript(
      """CREATE NODE Person (name: string, age: int);
        |CREATE NODE Place (name: string);
        |CREATE EDGE Knows (FROM Person ONE, TO Person MANY);
        |CREATE EDGE LivesIn (FROM Person ONE, TO Place ONE);
        |INSERT NODE Person (name: 'John', age: 30);
        |INSERT NODE Person (name: 'Jane', age: 25);
        |INSERT NODE Place (name: 'New York');
        |MATCH Person WHERE name: 'John';""".stripMargin)
    val rows = res.get.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("name") === "John")
    assert(rows(0).getAs[Long]("age") === 30L)
    assert(it.catalog.version === 4)
    assert(it.nodes("Person").count() === 2)
  }

  test("typed coercion: int/float/bool/date/datetime/null + defaults") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE T (i: int, f: float, b: bool, d: date, ts: datetime,
        |  s: string DEFAULT 'dflt', n: string);
        |INSERT NODE T (i: 7, f: 1.5, b: true, d: '2024-06-01', ts: '2024-06-01T12:30:00', n: null);""".stripMargin)
    val r = it.nodes("T").collect()(0)
    assert(r.getAs[Long]("i") === 7L)
    assert(r.getAs[Double]("f") === 1.5)
    assert(r.getAs[Boolean]("b") === true)
    assert(r.getAs[java.sql.Date]("d").toString === "2024-06-01")
    assert(r.getAs[String]("s") === "dflt") // default applied
    assert(r.isNullAt(r.fieldIndex("n")))
  }

  test("required-field enforcement and unknown fields rejected") {
    val it = fresh()
    it.executeScript("CREATE NODE P (name: string NOT NULL, age: int);")
    assertThrows[ExecError](it.executeScript("INSERT NODE P (age: 5);"))
    assertThrows[ExecError](it.executeScript("INSERT NODE P (name: 'x', nope: 1);"))
    assertThrows[ExecError](it.executeScript("INSERT NODE Nope (a: 1);"))
    // explicit null must not slip past NOT NULL
    assertThrows[ExecError](it.executeScript("INSERT NODE P (name: null);"))
    // literal/type mismatches are statement errors, not deferred crashes
    assertThrows[ExecError](it.executeScript("INSERT NODE P (name: 'x', age: true);"))
    // non-numeric id ref in an edge endpoint is a clean statement error
    it.executeScript(
      """CREATE EDGE E (FROM P ONE, TO P ONE);
        |INSERT NODE P (name: 'a');""".stripMargin)
    assertThrows[ExecError](
      it.executeScript("INSERT EDGE E FROM P ('nope') TO P (1);"))
  }

  test("CHECK constraints enforce at insert; NULL passes (SQL semantics)") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE Item (
        |  qty: int CHECK (qty >= 0 AND qty < 100),
        |  price: float CHECK (price > 0.0 AND qty < 50),
        |  state: string CHECK (state != 'void')
        |);""".stripMargin)
    // in-range row passes
    it.executeScript("INSERT NODE Item (qty: 10, price: 1.5, state: 'ok');")
    assert(it.nodes("Item").count() === 1)
    // each operator rejects a definite FALSE
    assertThrows[ExecError](
      it.executeScript("INSERT NODE Item (qty: 100, price: 1.0, state: 'ok');"))
    assertThrows[ExecError](
      it.executeScript("INSERT NODE Item (qty: 1, price: 0.0, state: 'ok');"))
    assertThrows[ExecError](
      it.executeScript("INSERT NODE Item (qty: 1, price: 1.0, state: 'void');"))
    // a CHECK may reference a SIBLING field (price's second atom)
    assertThrows[ExecError](
      it.executeScript("INSERT NODE Item (qty: 60, price: 1.0, state: 'ok');"))
    // NULL on the checked field passes — only definite FALSE rejects
    it.executeScript("INSERT NODE Item (qty: null, price: 1.0, state: 'ok');")
    assert(it.nodes("Item").count() === 2)
    // edge props enforce the same way
    it.executeScript(
      """CREATE EDGE Rated (FROM Item ONE, TO Item MANY,
        |  PROPS (stars: int CHECK (stars >= 1 AND stars <= 5)));""".stripMargin)
    it.executeScript("INSERT EDGE Rated FROM Item (1) TO Item (2) (stars: 5);")
    assertThrows[ExecError](it.executeScript(
      "INSERT EDGE Rated FROM Item (1) TO Item (2) (stars: 6);"))
    assert(it.edges("Rated").count() === 1)
  }

  test("insert edge resolves endpoints by id and by property") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE Person (name: string);
        |CREATE EDGE Knows (FROM Person ONE, TO Person MANY, PROPS (since: date));
        |INSERT NODE Person (name: 'John');
        |INSERT NODE Person (name: 'Jane');
        |INSERT EDGE Knows FROM Person (name: 'John') TO Person (name: 'Jane') (since: '2020-05-05');
        |INSERT EDGE Knows FROM Person (2) TO Person (name: 'John');""".stripMargin)
    val edges = it.edges("Knows").orderBy(col("_id")).collect()
    assert(edges.length === 2)
    assert(edges(0).getAs[Long]("_src") === 1L && edges(0).getAs[Long]("_dst") === 2L)
    assert(edges(0).getAs[java.sql.Date]("since").toString === "2020-05-05")
    assert(edges(1).getAs[Long]("_src") === 2L && edges(1).getAs[Long]("_dst") === 1L)
    // endpoint type validation
    it.executeScript("CREATE NODE Place (name: string); INSERT NODE Place (name: 'NY');")
    assertThrows[ExecError](it.executeScript(
      "INSERT EDGE Knows FROM Place (name: 'NY') TO Person (name: 'John');"))
    // unresolvable endpoint
    assertThrows[ExecError](it.executeScript(
      "INSERT EDGE Knows FROM Person (name: 'Nobody') TO Person (name: 'John');"))
  }

  test("edge props enforce NOT NULL like node fields") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE P (name: string);
        |CREATE EDGE E (FROM P ONE, TO P ONE, PROPS (weight: int NOT NULL, note: string));
        |INSERT NODE P (name: 'a');
        |INSERT NODE P (name: 'b');""".stripMargin)
    // missing required prop
    assertThrows[ExecError](it.executeScript(
      "INSERT EDGE E FROM P (name: 'a') TO P (name: 'b') (note: 'x');"))
    // explicit null for a required prop
    assertThrows[ExecError](it.executeScript(
      "INSERT EDGE E FROM P (name: 'a') TO P (name: 'b') (weight: null);"))
    // satisfied NOT NULL inserts fine; optional prop may be omitted
    it.executeScript("INSERT EDGE E FROM P (name: 'a') TO P (name: 'b') (weight: 3);")
    val e = it.edges("E").collect()(0)
    assert(e.getAs[Long]("weight") === 3L)
    assert(e.isNullAt(e.fieldIndex("note")))
  }

  test("int literals parse exactly: fractions rejected, no double round-trip") {
    val it = fresh()
    it.executeScript("CREATE NODE N (i: int, f: float);")
    // fractional literal into an int field is an error, not a truncation
    assertThrows[ExecError](it.executeScript("INSERT NODE N (i: 1.9);"))
    // above 2^53: a double round-trip would corrupt the low bits
    it.executeScript("INSERT NODE N (i: 9007199254740993, f: 1.5);")
    assert(it.nodes("N").collect()(0).getAs[Long]("i") === 9007199254740993L)
  }

  test("update and delete apply where-equality semantics") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE P (name: string, age: int);
        |INSERT NODE P (name: 'a', age: 1);
        |INSERT NODE P (name: 'b', age: 2);
        |INSERT NODE P (name: 'c', age: 2);
        |UPDATE NODE P SET age: 99 WHERE age: 2;
        |DELETE NODE P WHERE name: 'a';""".stripMargin)
    val rows = it.nodes("P").orderBy("name").collect()
    assert(rows.map(_.getAs[String]("name")).toSeq === Seq("b", "c"))
    assert(rows.forall(_.getAs[Long]("age") === 99L))
    // WHERE-less forms hit every row (reference dml_test.go)
    it.executeScript("UPDATE NODE P SET age: 7;")
    assert(it.nodes("P").collect().forall(_.getAs[Long]("age") === 7L))
    it.executeScript("DELETE NODE P;")
    assert(it.nodes("P").count() === 0)
  }

  test("alter migrates stored data; replay reconstructs state") {
    val it = fresh()
    it.replay(
      """CREATE NODE P (name: string);
        |INSERT NODE P (name: 'x');
        |ALTER NODE P ADD age: int;
        |INSERT NODE P (name: 'y', age: 5);
        |ALTER NODE P MODIFY age: float;""".stripMargin)
    val rows = it.nodes("P").orderBy("_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("age")))
    assert(rows(1).getAs[Double]("age") === 5.0)
    // same script replayed into a new interpreter gives the same state
    val it2 = fresh()
    it2.replay(
      """CREATE NODE P (name: string);
        |INSERT NODE P (name: 'x');
        |ALTER NODE P ADD age: int;
        |INSERT NODE P (name: 'y', age: 5);
        |ALTER NODE P MODIFY age: float;""".stripMargin)
    assert(it2.nodes("P").orderBy("_id").collect().toSeq ===
      it.nodes("P").orderBy("_id").collect().toSeq)
  }

  test("commit log: executeLogged appends mutations, replayLog reconstructs state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wal").toString
    val log = graft.store.CommitLog.open(dir)
    val it = fresh()
    it.executeLogged(
      """CREATE NODE Person (name: string, age: int);
        |INSERT NODE Person (name: 'John', age: 30);
        |INSERT NODE Person (name: 'Jane', age: 25);
        |UPDATE NODE Person SET age: 31 WHERE name: 'John';
        |MATCH Person WHERE name: 'John';""".stripMargin, log)
    // MATCH is a read — not logged
    val logged = java.nio.file.Files.readAllLines(log.path)
    assert(logged.size === 4)
    assert(!logged.toString.contains("MATCH"))
    // boot path: a fresh interpreter replaying the log reaches the same state
    val rebooted = fresh()
    rebooted.replayLog(log)
    val rows = rebooted.nodes("Person").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("age")).toMap
    assert(rows === Map("John" -> 31L, "Jane" -> 25L))
  }

  test("commit log: a CHECK'd schema round-trips through render and replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wal3").toString
    val log = graft.store.CommitLog.open(dir)
    val it = fresh()
    it.executeLogged(
      """CREATE NODE Item (qty: int CHECK (qty >= 0 AND qty < 100));
        |INSERT NODE Item (qty: 10);""".stripMargin, log)
    // the logged DDL carries the constraint text verbatim
    assert(java.nio.file.Files.readAllLines(log.path).toString
      .contains("CHECK (qty >= 0 AND qty < 100)"))
    // a rebooted interpreter reconstructs the constraint, data AND
    // enforcement — the replayed catalog still rejects violations
    val rebooted = fresh()
    rebooted.replayLog(log)
    assert(rebooted.nodes("Item").count() === 1)
    assertThrows[ExecError](
      rebooted.executeScript("INSERT NODE Item (qty: 200);"))
  }

  test("SHOW and DESCRIBE introspect the catalog and never reach the log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wal2").toString
    val log = graft.store.CommitLog.open(dir)
    val it = fresh()
    it.executeLogged(
      """CREATE NODE Person (id: int PRIMARY KEY, name: string NOT NULL,
        |  status: enum<'a','b'> DEFAULT 'a');
        |CREATE NODE Place (name: string);
        |CREATE EDGE Knows (FROM Person ONE, TO Person MANY, PROPS (since: string));""".stripMargin,
      log)
    val shown = it.executeScript("SHOW NODES;").get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(shown.toSeq === Seq(("Person", 3L, "id"), ("Place", 1L, "")))
    val edges = it.executeLogged("SHOW EDGES;", log).get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(edges.toSeq === Seq(("Knows", "Person", "ONE", "Person", "MANY", 1L)))
    val desc = it.executeScript("DESCRIBE NODE Person;").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getBoolean(4),
        Option(r.getString(5))))
    assert(desc.toSeq === Seq(
      ("id", "int", true, true, None),
      ("name", "string", false, true, None),
      ("status", "enum<'a', 'b'>", false, false, Some("a"))))
    val descE = it.executeScript("DESCRIBE EDGE Knows;").get.collect()
    assert(descE.map(_.getString(0)).toSeq === Seq("since"))
    // CHECK constraints surface in the describe table
    it.executeScript("CREATE NODE Item (qty: int CHECK (qty >= 0 AND qty < 100));")
    val descC = it.executeScript("DESCRIBE NODE Item;").get.collect()
    assert(descC.map(r => (r.getString(0), Option(r.getString(6)))).toSeq ===
      Seq(("qty", Some("qty >= 0 AND qty < 100"))))
    assertThrows[ExecError](it.executeScript("DESCRIBE NODE Nope;"))
    // reads never reach the log: only the three DDL statements are there
    assert(java.nio.file.Files.readAllLines(log.path).size === 3)
  }

  test("multi-element match unions every element's result set") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE Person (name: string, age: int);
        |CREATE NODE Place (name: string);
        |INSERT NODE Person (name: 'x', age: 1);
        |INSERT NODE Person (name: 'y', age: 2);
        |INSERT NODE Place (name: 'x');""".stripMargin)
    // both element types scanned (reference executeMatch loops the pattern)
    val all = it.executeScript("MATCH Person, Place;").get.collect()
    assert(all.length === 3)
    assert(all.map(_.getAs[String]("_label")).sorted.toSeq === Seq("Person", "Person", "Place"))
    // WHERE applies per element; Place lacks `age`, so it matches nothing
    val aged = it.executeScript("MATCH Person, Place WHERE age: 1;").get.collect()
    assert(aged.map(r => (r.getAs[String]("_label"), r.getAs[String]("name"))).toSeq
      === Seq(("Person", "x")))
    // single-element pattern keeps strict unknown-field errors
    assertThrows[ExecError](it.executeScript("MATCH Place WHERE age: 1;"))
    // no element has the field at all → error, not silent empty
    assertThrows[ExecError](it.executeScript("MATCH Person, Place WHERE nope: 1;"))
  }

  test("match with return projection and drop") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE P (name: string, age: int);
        |INSERT NODE P (name: 'a', age: 1);""".stripMargin)
    val res = it.executeScript("MATCH P WHERE age: 1 RETURN name;").get
    assert(res.columns.toSeq === Seq("name"))
    it.executeScript("DROP NODE P;")
    assertThrows[ExecError](it.nodes("P"))
  }

  private def stateOf(it: Interpreter, nodeLabels: Seq[String],
      edgeLabels: Seq[String] = Nil) =
    (nodeLabels.map(l => l -> it.nodes(l).orderBy("_id").collect().toSeq).toMap,
      edgeLabels.map(l => l -> it.edges(l).orderBy("_id").collect().toSeq).toMap)

  test("WAL compaction: snapshot + suffix replay ≡ uncompacted replay, bit-identical; log bounded by post-snapshot statements") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val pre =
      """CREATE NODE Person (name: string, age: int);
        |CREATE NODE Place (name: string);
        |CREATE EDGE Knows (FROM Person ONE, TO Person MANY, PROPS (since: string));
        |INSERT NODE Person (name: 'John', age: 30);
        |INSERT NODE Person (name: 'Jane', age: 25);
        |INSERT NODE Place (name: 'NYC');
        |INSERT EDGE Knows FROM Person (1) TO Person (2) (since: '2019');
        |UPDATE NODE Person SET age: 31 WHERE name: 'John';""".stripMargin
    val post =
      """INSERT NODE Person (name: 'Late', age: 1);
        |DELETE NODE Place WHERE name: 'NYC';""".stripMargin
    val it = fresh()
    val log0 = graft.store.CommitLog.open(dir)
    it.executeLogged(pre, log0)
    val preLines = java.nio.file.Files.readAllLines(log0.path).size
    assert(preLines === 8)
    val newLog = it.compact(dir)
    // old-generation log dropped; live log is a NEW empty generation
    assert(!java.nio.file.Files.exists(log0.path))
    assert(newLog.path !== log0.path)
    it.executeLogged(post, newLog)
    // the WAL holds ONLY post-snapshot statements — compaction's point
    assert(java.nio.file.Files.readAllLines(newLog.path).size === 2)
    // in-memory state after compaction matches an uncompacted replay
    val plain = fresh()
    plain.replay(pre); plain.replay(post)
    val want = stateOf(plain, Seq("Person", "Place"), Seq("Knows"))
    assert(stateOf(it, Seq("Person", "Place"), Seq("Knows")) === want)
    // boot path: snapshot load ⊕ suffix replay, bit-identical tables
    val rebooted = fresh()
    rebooted.bootFrom(dir)
    assert(stateOf(rebooted, Seq("Person", "Place"), Seq("Knows")) === want)
    assert(rebooted.catalog.version === it.catalog.version)
    // id counter survives: the next insert cannot collide
    rebooted.executeScript("INSERT NODE Person (name: 'After', age: 2);")
    val ids = rebooted.nodes("Person").select("_id").collect().map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    // second compaction rolls the generation again and stays equivalent
    val log2 = rebooted.compact(dir)
    assert(java.nio.file.Files.readAllLines(log2.path).isEmpty)
    val again = fresh()
    again.bootFrom(dir)
    assert(stateOf(again, Seq("Person", "Place"), Seq("Knows"))._1("Person")
      === stateOf(rebooted, Seq("Person", "Place"), Seq("Knows"))._1("Person"))
  }

  test("WAL auto-compaction policy keeps the live log under the statement bound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-autocompact").toString
    val it = fresh()
    var log = it.bootFrom(dir)
    it.executeLogged("CREATE NODE P (name: string);", log)
    for (i <- 1 to 10) {
      it.executeLogged(s"INSERT NODE P (name: 'u$i');", log)
      log = it.compactIfNeeded(dir, log, maxStatements = 4)
      // the policy bound: a just-checked log is always under the knob
      assert(java.nio.file.Files.readAllLines(log.path).size < 4)
    }
    // policy fired at least once (generation moved past 0)
    assert(graft.store.Snapshot.latest(dir).exists(_._1 >= 1))
    // state intact through the rolls
    val rebooted = fresh()
    rebooted.bootFrom(dir)
    assert(rebooted.nodes("P").count() === 10)
  }

  test("WAL compaction: an unpublished snapshot (no meta.json) is invisible — boot falls back to the full log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    val it = fresh()
    val log = graft.store.CommitLog.open(dir)
    it.executeLogged(
      """CREATE NODE P (name: string);
        |INSERT NODE P (name: 'a');""".stripMargin, log)
    // a crashed compaction: snapshot dir exists, meta.json never landed
    val partial = graft.store.Snapshot.snapDir(dir, 1)
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.writeString(partial.resolve("catalog.json"), "{}")
    assert(graft.store.Snapshot.latest(dir).isEmpty)
    val rebooted = fresh()
    rebooted.bootFrom(dir)
    assert(rebooted.nodes("P").collect().map(_.getAs[String]("name")).toSeq
      === Seq("a"))
  }

  test("binary commit log: frames replay to the same state as the text log") {
    import graft.store.CommitLog
    val script =
      """CREATE NODE Person (name: string, age: int);
        |INSERT NODE Person (name: 'John', age: 30);
        |INSERT NODE Person (name: 'Jane', age: 25);
        |UPDATE NODE Person SET age: 31 WHERE name: 'John';
        |MATCH Person WHERE name: 'John';""".stripMargin
    val tDir = java.nio.file.Files.createTempDirectory("graft-wal-t").toString
    val bDir = java.nio.file.Files.createTempDirectory("graft-wal-b").toString
    val tLog = CommitLog.open(tDir)
    val bLog = CommitLog.open(bDir, CommitLog.Binary)
    fresh().executeLogged(script, tLog)
    fresh().executeLogged(script, bLog)
    // same replayable entry sequence under both encodings (reads skipped)
    assert(bLog.entryCount === 4)
    var tEntries = Vector.empty[String]; tLog.replay(tEntries :+= _)
    var bEntries = Vector.empty[String]; bLog.replay(bEntries :+= _)
    assert(bEntries === tEntries)
    // the on-disk bytes really are length-prefixed frames: first header
    // = byte length of the first rendered statement
    val bytes = java.nio.file.Files.readAllBytes(bLog.path)
    val firstLen = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
    assert(firstLen === bEntries.head.getBytes("UTF-8").length)
    assert(new String(bytes, 4, firstLen, "UTF-8") === bEntries.head)
    // boot path from the binary log reconstructs identical state
    val rebooted = fresh()
    rebooted.replayLog(bLog)
    val rows = rebooted.nodes("Person").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("age")).toMap
    assert(rows === Map("John" -> 31L, "Jane" -> 25L))
  }

  test("binary commit log: represents the multi-line statement the text format rejects") {
    import graft.store.CommitLog
    val script = "CREATE NODE D (t: string);\n" +
      "INSERT NODE D (t: 'line one\nline two');"
    val tDir = java.nio.file.Files.createTempDirectory("graft-wal-ml-t").toString
    val bDir = java.nio.file.Files.createTempDirectory("graft-wal-ml-b").toString
    // text: rejected BEFORE any state change (replay poisoning guard)
    val itT = fresh()
    itT.executeScript("CREATE NODE D (t: string);")
    intercept[ExecError] {
      itT.executeLogged("INSERT NODE D (t: 'a\nb');", CommitLog.open(tDir))
    }
    // binary: framed, replayed, and the interior newline survives intact
    val bLog = CommitLog.open(bDir, CommitLog.Binary)
    fresh().executeLogged(script, bLog)
    val rebooted = fresh()
    rebooted.replayLog(bLog)
    assert(rebooted.nodes("D").collect().map(_.getAs[String]("t")).toSeq
      === Seq("line one\nline two"))
  }

  test("binary commit log: torn header ends replay cleanly; torn body and bad length are corruption") {
    import graft.store.CommitLog
    val dir = java.nio.file.Files.createTempDirectory("graft-wal-torn")
    def logWith(bytes: Array[Byte]): CommitLog = {
      val p = java.nio.file.Files.createTempFile(dir, "log", ".bin")
      java.nio.file.Files.write(p, bytes)
      new CommitLog(p, CommitLog.Binary)
    }
    def frame(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8")
      java.nio.ByteBuffer.allocate(4 + b.length).putInt(b.length).put(b).array()
    }
    val good = frame("CREATE NODE P (name: string);")
    // a crash mid-header append: entries before the tear replay, then stop
    var seen = Vector.empty[String]
    logWith(good ++ Array[Byte](0, 0)).replay(seen :+= _)
    assert(seen === Vector("CREATE NODE P (name: string);"))
    // a partial BODY is corruption, not a clean end (reference
    // commitlog.go:181 errors on ReadFull of the body)
    intercept[java.io.EOFException] {
      logWith(good ++ frame("INSERT NODE P (name: 'x');").dropRight(3))
        .replay(_ => ())
    }
    // a length past the 10 MB record guard is corruption
    intercept[IllegalStateException] {
      logWith(java.nio.ByteBuffer.allocate(4).putInt(64 << 20).array())
        .replay(_ => ())
    }
  }

  test("binary commit log: auto-compaction counts frames and the rolled generation keeps the format") {
    import graft.store.CommitLog
    val dir = java.nio.file.Files.createTempDirectory("graft-autocompact-b").toString
    val it = fresh()
    var log = it.bootFrom(dir, CommitLog.Binary)
    assert(log.format === CommitLog.Binary)
    it.executeLogged("CREATE NODE P (name: string);", log)
    for (i <- 1 to 10) {
      it.executeLogged(s"INSERT NODE P (name: 'u$i');", log)
      log = it.compactIfNeeded(dir, log, maxStatements = 4)
      assert(log.format === CommitLog.Binary)
      assert(log.entryCount < 4)
    }
    assert(graft.store.Snapshot.latest(dir).exists(_._1 >= 1))
    val rebooted = fresh()
    rebooted.bootFrom(dir, CommitLog.Binary)
    assert(rebooted.nodes("P").count() === 10)
  }

  test("CHECK literal typing is shared with the batch finder: fractional literal on int field") {
    val it = fresh()
    // CHECK (qty < 4.5) on an int field must be DDL-accepted and
    // enforced by comparing as double — the same lexical rule
    // Constraints.complementColumn uses, so insert-time and batch
    // semantics can never diverge
    it.executeScript("CREATE NODE N (qty: int CHECK (qty < 4.5));")
    it.executeScript("INSERT NODE N (qty: 4);")
    assertThrows[ExecError](it.executeScript("INSERT NODE N (qty: 5);"))
    assert(it.nodes("N").count() === 1)
  }

  test("CHECK enforces on date and datetime fields at insert") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE Ev (d: date CHECK (d >= '1995-01-01'),
        |  ts: datetime CHECK (ts < '2000-01-01T00:00:00'));""".stripMargin)
    it.executeScript("INSERT NODE Ev (d: '1996-05-05', ts: '1999-12-31T23:59:59');")
    assertThrows[ExecError](it.executeScript("INSERT NODE Ev (d: '1994-01-01');"))
    assertThrows[ExecError](it.executeScript("INSERT NODE Ev (ts: '2001-01-01T00:00:00');"))
    assert(it.nodes("Ev").count() === 1)
  }

  test("DDL-time CHECK validation rejects unenforceable constraints in scripts") {
    val it = fresh()
    // unknown sibling, incompatible literal, unparseable date — all
    // reject at CREATE/ALTER, not on the first unlucky INSERT
    assertThrows[graft.catalog.DdlError](
      it.executeScript("CREATE NODE P (a: float CHECK (missing > 0.0));"))
    assertThrows[graft.catalog.DdlError](
      it.executeScript("CREATE NODE P (a: int CHECK (a = 'x'));"))
    assertThrows[graft.catalog.DdlError](
      it.executeScript("CREATE NODE P (d: date CHECK (d > 'nope'));"))
    // nothing was created by the failed statements
    assert(it.catalog.nodes.isEmpty)
  }

  test("ALTER-time CHECK revalidation: violating stored rows reject the ALTER") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE T (a: int, b: float);
        |INSERT NODE T (a: 10, b: 1.5);
        |INSERT NODE T (a: 3, b: 0.5);""".stripMargin)
    // MODIFY adding a CHECK the stored rows violate → rejected, schema
    // and data unchanged (strict ADD CONSTRAINT semantics)
    assertThrows[ExecError](
      it.executeScript("ALTER NODE T MODIFY a: int CHECK (a < 5);"))
    assert(it.catalog.nodes("T").field("a").get.check.isEmpty)
    // ADD of a new field whose CHECK references a violating sibling →
    // rejected too (the new column is NULL and passes, the sibling atom
    // is definitely FALSE on a stored row)
    assertThrows[ExecError](
      it.executeScript("ALTER NODE T ADD c: int CHECK (a < 5);"))
    assert(it.catalog.nodes("T").field("c").isEmpty)
    // a CHECK the stored rows satisfy is accepted and then enforced
    it.executeScript("ALTER NODE T MODIFY a: int CHECK (a < 50);")
    assert(it.catalog.nodes("T").field("a").get.check.nonEmpty)
    assertThrows[ExecError](it.executeScript("INSERT NODE T (a: 99);"))
    it.executeScript("INSERT NODE T (a: 20);")
    assert(it.nodes("T").count() === 3)
  }

  test("scripted INDEX reaches the catalog layout and survives WAL replay + snapshot boot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val it = fresh()
    val log = graft.store.CommitLog.open(dir)
    it.executeLogged("CREATE NODE T (k: int PRIMARY KEY INDEX, v: string INDEX);", log)
    it.executeLogged("INSERT NODE T (k: 1, v: 'x');", log)
    val expected = graft.catalog.LayoutSpec(
      bucketBy = Some((graft.catalog.Ddl.IndexBuckets, Seq("k"))), sortBy = Seq("v"))
    assert(it.catalog.nodes("T").layout === expected)
    // ALTER adding an index migrates the layout
    it.executeLogged("ALTER NODE T ADD j: int INDEX;", log)
    assert(it.catalog.nodes("T").layout.sortBy === Seq("v", "j"))
    // WAL replay carries it (render emits INDEX, parser reads it back)
    val replayed = fresh()
    replayed.replayLog(log)
    assert(replayed.catalog.nodes("T").layout ===
      it.catalog.nodes("T").layout)
    // snapshot boot (catalog.json, NOT log replay) carries it too
    val snapDir = java.nio.file.Files.createTempDirectory("graft-idx-snap").toString
    val it2 = fresh()
    val log2 = graft.store.CommitLog.open(snapDir)
    it2.executeLogged("CREATE NODE T (k: int PRIMARY KEY INDEX, v: string INDEX);", log2)
    it2.executeLogged("INSERT NODE T (k: 1, v: 'x');", log2)
    it2.compact(snapDir)
    val booted = fresh()
    booted.bootFrom(snapDir)
    assert(booted.catalog.nodes("T").layout === expected)
  }

  test("generation GC: boot sweeps crashed-compaction partials and out-of-retention debris") {
    import graft.store.{CommitLog, Snapshot}
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-gc").toString
    val it = fresh()
    var log = CommitLog.open(dir)
    it.executeLogged("CREATE NODE P (v: int);", log)
    (1 to 5).foreach(i => it.executeLogged(s"INSERT NODE P (v: $i);", log))
    log = it.compact(dir) // publishes generation 1
    it.executeLogged("INSERT NODE P (v: 6);", log)
    // crash mid-compaction, twice: partial generations WITHOUT meta.json
    Seq(2L, 3L).foreach { g =>
      val partial = Snapshot.snapDir(dir, g)
      Files.createDirectories(partial.resolve("nodes").resolve("P"))
      Files.writeString(partial.resolve("catalog.json"), "{}")
    }
    // crash between publishMeta and the old-generation drop: gen-0
    // debris lingering (plain log), plus an orphan log above newest
    Files.writeString(Paths.get(dir).resolve("commit.log"), "INSERT NODE P (v: 99);\n")
    Files.writeString(Paths.get(dir).resolve("commit.5.log"), "")
    // boot: sweep runs first, then bounded replay
    val booted = fresh()
    booted.bootFrom(dir)
    assert(booted.nodes("P").count() === 6) // snapshot 5 + suffix 1
    val left = Files.list(Paths.get(dir)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(left)
      .asScala.map(_.getFileName.toString).toSet
    assert(names === Set("snapshot-1", "commit.1.log"),
      s"sweep left unexpected entries: $names")
    // bounded retention: a second compaction publishes gen 2, and the
    // default sweep (keep=1) retires gen 1 entirely
    val log2 = booted.compact(dir)
    booted.executeLogged("INSERT NODE P (v: 7);", log2)
    val names2 = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(dir)).iterator())
      .asScala.map(_.getFileName.toString).toSet
    assert(names2 === Set("snapshot-2", "commit.2.log"),
      s"post-compaction sweep left unexpected entries: $names2")
    // keep=2 retains the two newest published generations WITH their
    // suffix logs (the raised-retention / time-travel deployment)
    val dir2 = Files.createTempDirectory("graft-gc2").toString
    val it2 = fresh()
    var l2 = CommitLog.open(dir2)
    it2.executeLogged("CREATE NODE Q (v: int);", l2)
    l2 = it2.compact(dir2) // publishes gen 1
    it2.executeLogged("INSERT NODE Q (v: 1);", l2)
    // hand-publish generations 2 and 3 (compact's own sweep is keep=1,
    // so build the multi-generation state directly)
    Seq(2L, 3L).foreach { g =>
      val d = Snapshot.snapDir(dir2, g)
      Files.createDirectories(d)
      Files.writeString(d.resolve("catalog.json"), "{}")
      Snapshot.publishMeta(d, Snapshot.Meta(g, 10L, Seq("Q"), Nil))
      Files.writeString(Paths.get(dir2).resolve(s"commit.$g.log"), "")
    }
    Snapshot.sweep(dir2, keep = 2)
    val names3 = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(Paths.get(dir2)).iterator())
      .asScala.map(_.getFileName.toString).toSet
    assert(names3 === Set("snapshot-2", "commit.2.log",
      "snapshot-3", "commit.3.log"),
      s"keep=2 must retain exactly the two newest generations + logs: $names3")
  }

  test("CHECK with OR and field-vs-field atoms enforces at insert (3VL)") {
    val it = fresh()
    it.executeScript(
      """CREATE NODE T (lo: int, hi: int, flag: bool
        |  CHECK (lo < hi OR flag = true AND lo = 0));""".stripMargin)
    it.executeScript("INSERT NODE T (lo: 1, hi: 5);") // first disjunct true
    it.executeScript("INSERT NODE T (lo: 0, hi: 0, flag: true);") // second
    // both disjuncts definitely false -> reject
    assertThrows[ExecError](
      it.executeScript("INSERT NODE T (lo: 7, hi: 3, flag: false);"))
    // NULL can only save: hi null makes disjunct 1 NULL (not false),
    // so the row passes even though disjunct 2 is false
    it.executeScript("INSERT NODE T (lo: 7, flag: false);")
    assert(it.nodes("T").count() === 3)
    // DDL-time validation covers the field-vs-field form too
    assertThrows[graft.catalog.DdlError](
      it.executeScript("CREATE NODE U (a: int CHECK (a < missing));"))
    assertThrows[graft.catalog.DdlError](
      it.executeScript("CREATE NODE U (a: int, s: string CHECK (a < s));"))
    // WAL round-trip of the OR form
    val rendered = graft.lang.Ast.render(
      graft.lang.Parser.parse(
        "CREATE NODE V (a: int, b: int CHECK (a > 1 OR b < 2 AND a = b));").head)
    assert(rendered === "CREATE NODE V (a: int, b: int CHECK (a > 1 OR b < 2 AND a = b));")
    it.executeScript(rendered)
    assert(it.catalog.nodes("V").field("b").get.check.size === 2)
  }
}
