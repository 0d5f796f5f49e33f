package graft.lang

import scala.collection.mutable
import graft.catalog.{Ddl, GraphCatalog, Types}
import graft.store.GraphStore
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

final case class ExecError(msg: String) extends RuntimeException(msg)

/** Statement interpreter: grapho scripts → catalog mutations + Catalyst
  * plans over DataFrame-backed node/edge sets (reference:
  * /root/reference/server/server.go:219 executeStatement + commitlog.go
  * replay-on-boot).
  *
  * Differences from the reference, deliberate:
  *  - values are coerced to the catalog's types at insert (the reference
  *    stores number literals as raw strings, server.go:570);
  *  - UPDATE/DELETE/MATCH compile to Catalyst plans (projection /
  *    filter) over the label's DataFrame instead of driver-side map
  *    loops, so a replayed state can be arbitrarily large;
  *  - INSERTs buffer driver-side and materialize lazily in one batch
  *    per label (scripts are driver-sized by nature; bulk data belongs
  *    to the DataFrame API, not statements).
  *
  * Statement WAL semantics: `replay(script)` reconstructs state by
  * re-executing the ordered log, exactly like the reference server's
  * boot path.
  */
final class Interpreter(spark: SparkSession) {

  private var cat: GraphCatalog = GraphCatalog.empty
  def catalog: GraphCatalog = cat

  private final class LabelState(var schema: StructType) {
    var df: Option[DataFrame] = None
    val pending = mutable.ArrayBuffer.empty[Row]

    def materialize(): DataFrame = {
      val base = df.getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema))
      if (pending.isEmpty) base
      else {
        val batch = spark.createDataFrame(
          spark.sparkContext.parallelize(pending.toSeq), schema)
        val merged = base.unionByName(batch)
        pending.clear()
        df = Some(merged)
        merged
      }
    }

    /** Replace state with a transformed DF; checkpoint to keep the plan
      * from growing linearly with script length.
      */
    def mutate(f: DataFrame => DataFrame): Unit =
      df = Some(f(materialize()).localCheckpoint())
  }

  private val nodeState = mutable.Map.empty[String, LabelState]
  private val edgeState = mutable.Map.empty[String, LabelState]
  private var nextId = 1L

  // ------------------------------------------------------------ schema

  private def nodeSchema(label: String): StructType = {
    val nt = cat.nodes(label)
    StructType(StructField("_id", LongType, nullable = false) +:
      Types.toSchema(nt.fields).fields.toSeq)
  }

  private def edgeSchema(label: String): StructType = {
    val et = cat.edges(label)
    StructType(
      StructField("_id", LongType, nullable = false) +:
      StructField("_src", LongType, nullable = false) +:
      StructField("_dst", LongType, nullable = false) +:
      Types.toSchema(et.props).fields.toSeq)
  }

  // ------------------------------------------------------------ values

  /** Literal → typed value per the catalog field type. */
  private def coerce(lit: Ast.Literal, tpe: Ast.TypeSpec): Any = lit.kind match {
    case Ast.LitKind.Null => null
    case Ast.LitKind.Bool => Types.toSpark(tpe) match {
      case BooleanType => lit.text == "true"
      case _ => throw ExecError(s"boolean literal for non-boolean field type")
    }
    case Ast.LitKind.Num => Types.toSpark(tpe) match {
      // parse int literals as longs directly: no silent truncation of
      // fractions, no precision loss above 2^53 from a double round-trip
      case LongType =>
        try lit.text.toLong catch {
          case _: NumberFormatException =>
            throw ExecError(s"int field requires an integer literal, got '${lit.text}'")
        }
      case DoubleType => lit.text.toDouble
      case _ => throw ExecError(s"number literal for non-numeric field type")
    }
    case Ast.LitKind.Str => Types.toSpark(tpe) match {
      case StringType => lit.text
      case DateType => java.sql.Date.valueOf(lit.text)
      case TimestampType => java.sql.Timestamp.valueOf(lit.text.replace("T", " "))
      case BinaryType => lit.text.getBytes("UTF-8")
      case _ => throw ExecError(s"string literal for incompatible field type")
    }
  }

  private def fieldType(label: String, name: String, isNode: Boolean): Ast.TypeSpec = {
    val spec =
      if (isNode) cat.nodes(label).field(name)
      else cat.edges(label).prop(name)
    spec.getOrElse(throw ExecError(s"unknown field '$name' on $label")).tpe
  }

  /** CHECK literal typing — the ONE rule shared with the batch finder
    * (Constraints.complementColumn): numeric literals type LEXICALLY
    * (double iff the text contains '.', else long), so `CHECK (qty <
    * 4.5)` on an int field compares as double at insert time exactly
    * as it does in the violation scan. Non-numeric literals coerce to
    * the referenced field's catalog type (dates/timestamps parse).
    */
  private def checkLiteral(c: Ast.CheckCmp, label: String, isNode: Boolean): Any =
    c.value.kind match {
      case Ast.LitKind.Num =>
        if (c.value.text.contains('.')) c.value.text.toDouble
        else c.value.text.toLong
      case _ => coerce(c.value, fieldType(label, c.field, isNode))
    }

  /** Insert-time CHECK enforcement (SQL semantics: a NULL atom result
    * PASSES its disjunct only via the 3VL tables — a row is rejected
    * iff the whole DNF is definite FALSE, i.e. EVERY disjunct contains
    * a definitely-FALSE atom; NULL anywhere can only save a row, never
    * doom it — exactly matching Constraints.checkViolations). Field
    * types are pre-validated at DDL time (Ddl.validateChecks), so the
    * comparisons are Long/Double/String/Boolean/Date/Timestamp.
    */
  private def enforceChecks(label: String, fields: Seq[graft.catalog.FieldSpec],
      byField: Map[String, Any], isNode: Boolean): Unit = {
    // 3VL atom value: None = NULL (null field, null literal, or null
    // sibling), Some(b) = definite truth value
    def atom(f: graft.catalog.FieldSpec, c: Ast.CheckCmp): Option[Boolean] = {
      val v = byField.getOrElse(c.field,
        throw ExecError(s"CHECK on '${f.name}' references unknown field '${c.field}'"))
      val w = c.rhsField match {
        case Some(r) => byField.getOrElse(r,
          throw ExecError(s"CHECK on '${f.name}' references unknown field '$r'"))
        case None =>
          if (c.value.kind == Ast.LitKind.Null) null
          else checkLiteral(c, label, isNode)
      }
      if (v == null || w == null) None
      else {
        val ord = (v, w) match {
          case (a: Long, b: Long) => java.lang.Long.compare(a, b)
          case (a: java.lang.Number, b: java.lang.Number) =>
            java.lang.Double.compare(a.doubleValue, b.doubleValue)
          case (a: String, b: String) => a.compareTo(b)
          case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
          case (a: java.sql.Date, b: java.sql.Date) => a.compareTo(b)
          case (a: java.sql.Timestamp, b: java.sql.Timestamp) => a.compareTo(b)
          case _ => throw ExecError(
            s"CHECK on '${f.name}': incompatible comparison for '${c.field}'")
        }
        Some(c.op match {
          case Ast.CmpOp.Eq => ord == 0
          case Ast.CmpOp.Ne => ord != 0
          case Ast.CmpOp.Lt => ord < 0
          case Ast.CmpOp.Le => ord <= 0
          case Ast.CmpOp.Gt => ord > 0
          case Ast.CmpOp.Ge => ord >= 0
        })
      }
    }
    for (f <- fields if f.check.nonEmpty) {
      // a disjunct is definitely FALSE iff some atom is Some(false)
      // (3VL AND: FALSE dominates NULL); the DNF is definitely FALSE
      // iff every disjunct is
      val definiteFalse = f.check.forall(conj =>
        conj.exists(c => atom(f, c).contains(false)))
      if (definiteFalse) throw ExecError(
        s"CHECK violation on '$label.${f.name}': " +
          s"CHECK (${Ast.renderCheck(f.check)}) is false for the row")
    }
  }

  private def whereCond(label: String, props: Seq[Ast.Property], isNode: Boolean): Column =
    props.foldLeft(lit(true)) { (acc, p) =>
      acc && (col(p.name) <=> lit(coerce(p.value, fieldType(label, p.name, isNode))))
    }

  // ----------------------------------------------------------- execute

  /** Execute one statement; MATCH returns its result DataFrame. */
  def execute(stmt: Ast.Stmt): Option[DataFrame] = stmt match {

    case ddl @ (_: Ast.CreateNode | _: Ast.CreateEdge | _: Ast.AlterNode |
                _: Ast.AlterEdge | _: Ast.DropNode | _: Ast.DropEdge) =>
      applyDdl(ddl); None

    case Ast.InsertNode(label, props) =>
      val nt = cat.nodes.getOrElse(label, throw ExecError(s"unknown node type: $label"))
      val st = nodeState.getOrElseUpdate(label, new LabelState(nodeSchema(label)))
      val byName = props.map(p => p.name -> p).toMap
      props.foreach(p => fieldType(label, p.name, isNode = true)) // unknown-field check
      val values = nt.fields.map { f =>
        val v = byName.get(f.name).map(p => coerce(p.value, f.tpe))
          .orElse(f.defaultRaw.map(d => coerce(inferLiteral(d), f.tpe)))
          .getOrElse {
            if (f.notNull) throw ExecError(s"required field '${f.name}' is missing")
            null
          }
        // explicit `field: null` (or DEFAULT null) must not slip past
        // NOT NULL — the schema declares the column non-nullable
        if (v == null && f.notNull)
          throw ExecError(s"required field '${f.name}' is null")
        v
      }
      enforceChecks(label, nt.fields,
        nt.fields.map(_.name).zip(values).toMap, isNode = true)
      st.pending += Row.fromSeq(nextIdValue() +: values)
      None

    case Ast.InsertEdge(label, fromRef, toRef, props) =>
      val et = cat.edges.getOrElse(label, throw ExecError(s"unknown edge type: $label"))
      if (fromRef.nodeType != et.from.label)
        throw ExecError(s"FROM node type '${fromRef.nodeType}' does not match edge FROM '${et.from.label}'")
      if (toRef.nodeType != et.to.label)
        throw ExecError(s"TO node type '${toRef.nodeType}' does not match edge TO '${et.to.label}'")
      val src = findNodeId(fromRef)
      val dst = findNodeId(toRef)
      val st = edgeState.getOrElseUpdate(label, new LabelState(edgeSchema(label)))
      val byName = props.map(p => p.name -> p).toMap
      props.foreach(p => fieldType(label, p.name, isNode = false))
      val values = et.props.map { f =>
        val v = byName.get(f.name).map(p => coerce(p.value, f.tpe))
          .orElse(f.defaultRaw.map(d => coerce(inferLiteral(d), f.tpe)))
          .getOrElse {
            if (f.notNull) throw ExecError(s"required prop '${f.name}' is missing")
            null
          }
        // mirror the node path: the edge schema declares notNull props
        // non-nullable, so a null here would corrupt createDataFrame
        if (v == null && f.notNull)
          throw ExecError(s"required prop '${f.name}' is null")
        v
      }
      enforceChecks(label, et.props,
        et.props.map(_.name).zip(values).toMap, isNode = false)
      st.pending += Row.fromSeq(Seq(nextIdValue(), src, dst) ++ values)
      None

    case Ast.UpdateNode(label, set, where) =>
      val st = stateOf(label, isNode = true)
      val sets = set.map(p =>
        p.name -> lit(coerce(p.value, fieldType(label, p.name, isNode = true)))).toMap
      st.mutate(GraphStore.updateWhere(_, whereCond(label, where, isNode = true), sets))
      None

    case Ast.UpdateEdge(label, set, where) =>
      val st = stateOf(label, isNode = false)
      val sets = set.map(p =>
        p.name -> lit(coerce(p.value, fieldType(label, p.name, isNode = false)))).toMap
      st.mutate(GraphStore.updateWhere(_, whereCond(label, where, isNode = false), sets))
      None

    case Ast.DeleteNode(label, where) =>
      stateOf(label, isNode = true)
        .mutate(GraphStore.deleteWhere(_, whereCond(label, where, isNode = true)))
      None

    case Ast.DeleteEdge(label, where) =>
      stateOf(label, isNode = false)
        .mutate(GraphStore.deleteWhere(_, whereCond(label, where, isNode = false)))
      None

    case Ast.Match(pattern, where, ret) =>
      // The reference matches each pattern element independently and
      // emits every element's result set (server.go:724 executeMatch
      // loops over stmt.Pattern). Re-expressed relationally: one
      // filtered scan per element, unioned by name with a `_label`
      // discriminator. A WHERE condition naming a prop an element
      // lacks matches nothing for that element (matchesConditions
      // returns false on a missing key) — with a single element that
      // is still a hard error, which catches typos.
      if (pattern.isEmpty) throw ExecError("empty MATCH pattern")
      pattern.foreach { el =>
        if (!cat.nodes.contains(el.tpe)) throw ExecError(s"unknown node type: ${el.tpe}")
      }
      val dfs = pattern.map { el =>
        val nt = cat.nodes(el.tpe)
        if (where.exists(p => nt.field(p.name).isEmpty)) {
          if (pattern.sizeIs == 1)
            throw ExecError(s"unknown field '${where.find(p => nt.field(p.name).isEmpty).get.name}' on ${el.tpe}")
          None // this element cannot match; others still can
        } else Some(nodes(el.tpe).filter(whereCond(el.tpe, where, isNode = true)))
      }
      val df =
        if (pattern.sizeIs == 1) dfs.head.get // single element: schema untouched
        else {
          val labelled = pattern.zip(dfs).collect { case (el, Some(d)) =>
            d.withColumn("_label", lit(el.tpe))
          }
          if (labelled.isEmpty)
            throw ExecError("WHERE references fields absent from every pattern element")
          labelled.reduce(_.unionByName(_, allowMissingColumns = true))
        }
      Some(if (ret.nonEmpty) df.select(ret.map(col): _*) else df)

    case Ast.Show(showEdges) =>
      import spark.implicits._
      if (showEdges) {
        val rows = cat.edges.values.toSeq.sortBy(_.name).map { e =>
          (e.name, e.from.label, if (e.from.many) "MANY" else "ONE",
            e.to.label, if (e.to.many) "MANY" else "ONE", e.props.size.toLong)
        }
        Some(rows.toDF("edge", "from_label", "from_card", "to_label", "to_card", "n_props"))
      } else {
        val rows = cat.nodes.values.toSeq.sortBy(_.name).map { n =>
          (n.name, n.fields.size.toLong, n.pk.mkString(","))
        }
        Some(rows.toDF("node", "n_fields", "primary_key"))
      }

    case Ast.Describe(isEdge, name) =>
      import spark.implicits._
      val (fields, pk) =
        if (isEdge) {
          val et = cat.edges.getOrElse(name, throw ExecError(s"unknown edge type: $name"))
          (et.props, Nil)
        } else {
          val nt = cat.nodes.getOrElse(name, throw ExecError(s"unknown node type: $name"))
          (nt.fields, nt.pk)
        }
      val rows = fields.map { f =>
        (f.name, Ast.renderType(f.tpe), pk.contains(f.name), f.unique, f.notNull,
          f.defaultRaw.orNull,
          if (f.check.isEmpty) null
          else Ast.renderCheck(f.check))
      }
      Some(rows.toDF("field", "type", "primary_key", "unique", "not_null",
        "default", "check"))
  }

  /** Parse + execute a script; returns the last MATCH result, if any. */
  def executeScript(script: String): Option[DataFrame] =
    Parser.parse(script).foldLeft(Option.empty[DataFrame]) { (acc, s) =>
      execute(s).orElse(acc)
    }

  /** WAL replay: reconstruct state from an ordered statement log. */
  def replay(script: String): Unit = { executeScript(script); () }

  /** Boot-path state reconstruction from an on-disk commit log
    * (reference server replay-on-boot: every logged statement re-applied
    * in order).
    */
  def replayLog(log: graft.store.CommitLog): Unit =
    log.replay(line => { executeScript(line); () })

  /** Execute a script AND append its statements to the commit log —
    * the serving-path pairing of [[replayLog]]. MATCH statements are
    * not logged (reads don't mutate state, reference server.go appends
    * mutating commands only). Ordering per statement: render first
    * (loggability check — the TEXT WAL is line-based, so a raw newline
    * inside a string literal is rejected BEFORE any state change; the
    * BINARY format frames by length and represents it fine), then
    * execute, then append — a statement that fails execution never
    * reaches the log, so replay cannot be poisoned.
    */
  def executeLogged(script: String, log: graft.store.CommitLog): Option[DataFrame] =
    Parser.parse(script).foldLeft(Option.empty[DataFrame]) { (acc, s) =>
      s match {
        // reads never reach the log (reference server.go appends
        // mutating commands only)
        case _: Ast.Match | _: Ast.Show | _: Ast.Describe => execute(s).orElse(acc)
        case _ =>
          val line = Ast.render(s)
          if (log.format == graft.store.CommitLog.Text &&
              line.exists(c => c == '\n' || c == '\r'))
            throw ExecError(
              "statement contains a raw newline in a string literal; " +
                "the line-based text commit log cannot represent it " +
                "(use the binary log format)")
          val out = execute(s)
          log.append(line)
          out.orElse(acc)
      }
    }

  /** Snapshot-compaction of the statement WAL (the catalog store's
    * snapshot + bounded-replay discipline extended to the DATA log —
    * the reference replays the FULL commit log on boot): write the
    * current label tables + catalog + id counter as snapshot
    * generation G+1, open a fresh empty `commit.{G+1}.log`, and drop
    * the old generation. From here, boot work is bounded by statements
    * logged AFTER the snapshot, not by history. Publishing is the
    * atomic meta.json rename ([[graft.store.Snapshot]]); a crash
    * mid-compaction leaves the previous generation + its full log
    * authoritative.
    *
    * Returns the new generation's (empty) commit log; the caller
    * continues with `executeLogged(script, newLog)`. `format` sets the
    * fresh generation's WAL encoding (a deployment flag, reference
    * cmd/server/main.go:43 — compaction is the natural point to switch
    * formats, since the new log starts empty).
    */
  def compact(dataDir: String,
      format: graft.store.CommitLog.Format = graft.store.CommitLog.Text)
      : graft.store.CommitLog = {
    import graft.store.Snapshot
    val gen = Snapshot.latest(dataDir).map(_._1).getOrElse(0L) + 1
    val dir = Snapshot.snapDir(dataDir, gen)
    Snapshot.deleteRecursively(dir) // stale partial from a crashed attempt
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("catalog.json"),
      graft.catalog.CatalogJson.write(cat))
    val nodeLabels = nodeState.keys.toSeq.sorted
    val edgeLabels = edgeState.keys.toSeq.sorted
    nodeLabels.foreach { l =>
      nodeState(l).materialize().write.mode("overwrite")
        .parquet(dir.resolve("nodes").resolve(l).toString)
    }
    edgeLabels.foreach { l =>
      edgeState(l).materialize().write.mode("overwrite")
        .parquet(dir.resolve("edges").resolve(l).toString)
    }
    Snapshot.publishMeta(dir,
      Snapshot.Meta(gen, nextId, nodeLabels, edgeLabels))
    val log = Snapshot.openLog(dataDir, gen, format)
    // eager empty log file: the generation's WAL exists from birth
    if (!java.nio.file.Files.exists(log.path))
      java.nio.file.Files.createFile(log.path)
    // repoint live state at the snapshot files BEFORE dropping the old
    // generation (a previously-booted state may still read old files),
    // and so post-compaction lineage starts from the snapshot
    nodeLabels.foreach { l =>
      nodeState(l).df = Some(spark.read.schema(nodeSchema(l))
        .parquet(dir.resolve("nodes").resolve(l).toString))
    }
    edgeLabels.foreach { l =>
      edgeState(l).df = Some(spark.read.schema(edgeSchema(l))
        .parquet(dir.resolve("edges").resolve(l).toString))
    }
    // retention sweep (supersedes the plain drop-older): also clears
    // unpublished partials a crashed earlier attempt may have left
    Snapshot.sweep(dataDir, snapshotKeep)
    log
  }

  /** Generation-retention knob for the boot/compaction sweeps — the
    * r12 advisory: `sweep(keep = n)` existed but nothing plumbed it,
    * so a deployment that retained extra generations for time travel
    * lost generation N-1 on the next boot. Env/prop-overridable,
    * default 1 (live generation only).
    */
  private def snapshotKeep: Int =
    sys.props.get("graft.snapshotKeep")
      .orElse(sys.env.get("GRAFT_SNAPSHOT_KEEP"))
      .map(_.toInt).getOrElse(1)

  /** Standing compaction policy for a serving deployment: roll the WAL
    * into a snapshot generation once it exceeds `maxStatements` lines
    * (run after each script; the check is one driver-side line count
    * of a bounded file). Keeps boot replay bounded by the policy knob
    * instead of history. Returns the log to continue with — the fresh
    * generation's when compaction fired (same format), the same one
    * otherwise. `entryCount` is the format-independent unit (text
    * lines ≡ binary frames).
    */
  def compactIfNeeded(dataDir: String, log: graft.store.CommitLog,
      maxStatements: Int): graft.store.CommitLog =
    if (log.entryCount >= maxStatements) compact(dataDir, log.format) else log

  /** Boot-path state reconstruction with bounded replay: load the
    * latest snapshot generation (catalog, label tables, id counter)
    * and replay only its suffix log — or, with no snapshot, replay the
    * full generation-0 log (the reference's plain replay-on-boot).
    * Returns the live generation's commit log for serving. `format`
    * must match what the deployment wrote with — a flag, exactly as in
    * the reference (cmd/server/main.go:43), not file magic.
    */
  def bootFrom(dataDir: String,
      format: graft.store.CommitLog.Format = graft.store.CommitLog.Text)
      : graft.store.CommitLog = {
    import graft.store.Snapshot
    // generation GC at boot: crashed-compaction partials and out-of-
    // retention generations never accumulate across restarts (the
    // sweep keeps the newest published generation + its WAL; with no
    // published generation it keeps the gen-0 log, which IS the state)
    Snapshot.sweep(dataDir, snapshotKeep)
    Snapshot.latest(dataDir) match {
      case Some((gen, meta)) =>
        val dir = Snapshot.snapDir(dataDir, gen)
        cat = graft.catalog.CatalogJson.read(
          java.nio.file.Files.readString(dir.resolve("catalog.json")))
        nextId = meta.nextId
        nodeState.clear(); edgeState.clear()
        meta.nodes.foreach { l =>
          val st = new LabelState(nodeSchema(l))
          st.df = Some(spark.read.schema(nodeSchema(l))
            .parquet(dir.resolve("nodes").resolve(l).toString))
          nodeState(l) = st
        }
        meta.edges.foreach { l =>
          val st = new LabelState(edgeSchema(l))
          st.df = Some(spark.read.schema(edgeSchema(l))
            .parquet(dir.resolve("edges").resolve(l).toString))
          edgeState(l) = st
        }
        val log = Snapshot.openLog(dataDir, gen, format)
        replayLog(log)
        log
      case None =>
        val log = graft.store.CommitLog.open(dataDir, format)
        replayLog(log)
        log
    }
  }

  /** Current node set for a label (empty DF if nothing inserted). */
  def nodes(label: String): DataFrame = {
    if (!cat.nodes.contains(label)) throw ExecError(s"unknown node type: $label")
    nodeState.getOrElseUpdate(label, new LabelState(nodeSchema(label))).materialize()
  }

  /** Current edge set for a label. */
  def edges(label: String): DataFrame = {
    if (!cat.edges.contains(label)) throw ExecError(s"unknown edge type: $label")
    edgeState.getOrElseUpdate(label, new LabelState(edgeSchema(label))).materialize()
  }

  // ----------------------------------------------------------- helpers

  private def nextIdValue(): Long = { val v = nextId; nextId += 1; v }

  private def stateOf(label: String, isNode: Boolean): LabelState =
    if (isNode) {
      if (!cat.nodes.contains(label)) throw ExecError(s"unknown node type: $label")
      nodeState.getOrElseUpdate(label, new LabelState(nodeSchema(label)))
    } else {
      if (!cat.edges.contains(label)) throw ExecError(s"unknown edge type: $label")
      edgeState.getOrElseUpdate(label, new LabelState(edgeSchema(label)))
    }

  /** Endpoint resolution (reference server.go:745 findNodeID): by id, or
    * smallest-id row matching the property equalities (deterministic
    * where the reference takes map-iteration order).
    */
  private def findNodeId(ref: Ast.NodeRef): Long = {
    val df = nodes(ref.nodeType)
    val matched = ref.id match {
      case Some(idLit) =>
        // graft node ids are longs; a non-numeric id ref is a statement
        // error, not a NumberFormatException from the bowels
        val id = try idLit.text.toLong catch {
          case _: NumberFormatException =>
            throw ExecError(s"node id must be an integer, got '${idLit.text}'")
        }
        df.filter(col("_id") === lit(id))
      case None => df.filter(whereCond(ref.nodeType, ref.properties, isNode = true))
    }
    val rows = matched.select(min(col("_id"))).collect()
    if (rows.isEmpty || rows(0).isNullAt(0))
      throw ExecError(s"no matching ${ref.nodeType} node found")
    rows(0).getLong(0)
  }

  private def inferLiteral(raw: String): Ast.Literal =
    if (raw == "null") Ast.Literal(Ast.LitKind.Null, raw)
    else if (raw == "true" || raw == "false") Ast.Literal(Ast.LitKind.Bool, raw)
    else if (raw.nonEmpty && raw.forall(c => c.isDigit || c == '.' || c == '-'))
      Ast.Literal(Ast.LitKind.Num, raw)
    else Ast.Literal(Ast.LitKind.Str, raw)

  /** ALTER-time CHECK revalidation — strict ADD CONSTRAINT semantics
    * (documented choice per SURVEY §2.2 row 18b): an ALTER that adds or
    * changes a CHECK is REJECTED when already-stored rows violate it,
    * before any catalog or data mutation, so schema and data never
    * disagree. The probe previews the post-ALTER column (new fields
    * appear as NULL — NULL passes, but a sibling-field atom can still
    * be definitely FALSE on stored rows) and runs the same
    * Constraints.checkViolations predicate the batch finder uses.
    */
  private def revalidateCheck(label: String, fd: Ast.FieldDef,
      isNode: Boolean, added: Boolean): Unit =
    if (fd.check.nonEmpty) {
      val stOpt = if (isNode) nodeState.get(label) else edgeState.get(label)
      stOpt.foreach { st =>
        val base = st.materialize()
        val preview =
          if (added) base.withColumn(fd.name, lit(null).cast(Types.toSpark(fd.tpe)))
          else base.withColumn(fd.name, col(fd.name).cast(Types.toSpark(fd.tpe)))
        val bad = graft.store.Constraints.checkViolations(preview, fd.check).count()
        if (bad > 0) throw ExecError(
          s"ALTER rejected: CHECK on '$label.${fd.name}' is violated by " +
            s"$bad stored row${if (bad == 1) "" else "s"}")
      }
    }

  private def applyDdl(stmt: Ast.Stmt): Unit = {
    val next = Ddl(cat, stmt) // validates (incl. DDL-time CHECK sanity)
    stmt match {
      case Ast.AlterNode(n, Ast.AlterNodeAction.AddField(fd)) =>
        revalidateCheck(n, fd, isNode = true, added = true)
      case Ast.AlterNode(n, Ast.AlterNodeAction.ModifyField(fd)) =>
        revalidateCheck(n, fd, isNode = true, added = false)
      case Ast.AlterEdge(n, Ast.AlterEdgeAction.AddProp(fd)) =>
        revalidateCheck(n, fd, isNode = false, added = true)
      case Ast.AlterEdge(n, Ast.AlterEdgeAction.ModifyProp(fd)) =>
        revalidateCheck(n, fd, isNode = false, added = false)
      case _ => ()
    }
    cat = next
    // migrate stored DataFrames on schema change (SURVEY §2.1 row 3)
    stmt match {
      case Ast.AlterNode(name, action) =>
        nodeState.get(name).foreach(st => migrate(st, action, nodeSchema(name)))
      case Ast.AlterEdge(name, action) =>
        edgeState.get(name).foreach { st =>
          val migrated = action match {
            case Ast.AlterEdgeAction.AddProp(fd) =>
              Some((df: DataFrame) => df.withColumn(fd.name,
                lit(null).cast(Types.toSpark(fd.tpe))))
            case Ast.AlterEdgeAction.DropProp(n) =>
              Some((df: DataFrame) => df.drop(n))
            case Ast.AlterEdgeAction.ModifyProp(fd) =>
              Some((df: DataFrame) => df.withColumn(fd.name,
                col(fd.name).cast(Types.toSpark(fd.tpe))))
            case _ => None
          }
          migrated.foreach(st.mutate)
          st.schema = edgeSchema(name)
        }
      case Ast.DropNode(name) => nodeState.remove(name)
      case Ast.DropEdge(name) => edgeState.remove(name)
      case _ => ()
    }
  }

  private def migrate(st: LabelState, action: Ast.AlterNodeAction, newSchema: StructType): Unit = {
    val f: Option[DataFrame => DataFrame] = action match {
      case Ast.AlterNodeAction.AddField(fd) =>
        Some(_.withColumn(fd.name, lit(null).cast(Types.toSpark(fd.tpe))))
      case Ast.AlterNodeAction.DropField(n) => Some(_.drop(n))
      case Ast.AlterNodeAction.ModifyField(fd) =>
        Some(df => df.withColumn(fd.name, col(fd.name).cast(Types.toSpark(fd.tpe))))
      case Ast.AlterNodeAction.SetPrimaryKey(_) => None
    }
    f.foreach(st.mutate)
    st.schema = newSchema
  }
}
