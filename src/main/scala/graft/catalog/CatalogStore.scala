package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import graft.lang.{Ast, Parser}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.JsonMethods.{compact, render}

/** Catalog persistence (reference: /root/reference/catalog/store.go —
  * same on-disk shape: a JSON snapshot per version, a JSONL DDL log, and
  * a manifest pointing at the current snapshot + log offset). The
  * catalog is driver-side metadata — tiny — while the data itself lives
  * in parquet, so persistence here is plain local/DFS file IO.
  *
  * Layout under `dir`:
  *   manifest.json            {"snapshotVersion": N, "ddlEntries": M}
  *   snapshot-N.json          full catalog at version N
  *   ddl.log                  JSONL: one {"version": V, "ddl": "<stmt>"} per line
  *
  * Load = read snapshot + replay the DDL log entries with version >
  * snapshot version, re-parsing each statement through graft.lang.Parser
  * — the same replay-on-boot discipline as the reference server.
  */
final class CatalogStore(dir: String) {
  private val root: Path = Paths.get(dir)
  Files.createDirectories(root)

  private def manifestPath = root.resolve("manifest.json")
  private def logPath = root.resolve("ddl.log")
  private def snapshotPath(v: Long) = root.resolve(s"snapshot-$v.json")

  /** Append one applied DDL statement (raw text) to the log. DSYNC to
    * match the reference's synchronous AppendDDL
    * (/root/reference/catalog/store.go:131) and graft's own data-path
    * WAL (store.CommitLog): an acknowledged DDL must survive a crash —
    * the schema log cannot be weaker than the DML log it governs.
    */
  def logDdl(version: Long, ddlText: String): Unit = {
    val line = compact(render(JObject(
      "version" -> JLong(version), "ddl" -> JString(ddlText)))) + "\n"
    Files.write(logPath, line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND,
      StandardOpenOption.DSYNC)
  }

  /** Write a full snapshot + manifest for the given catalog. */
  def snapshot(cat: GraphCatalog): Unit = {
    Files.writeString(snapshotPath(cat.version), CatalogJson.write(cat))
    val entries = if (Files.exists(logPath)) Files.readAllLines(logPath).size() else 0
    Files.writeString(manifestPath, compact(render(JObject(
      "snapshotVersion" -> JLong(cat.version), "ddlEntries" -> JInt(entries)))))
  }

  /** Load = snapshot + replay of newer log entries. Empty store → empty
    * catalog.
    */
  def load(): GraphCatalog = {
    val base =
      if (Files.exists(manifestPath)) {
        val m = JsonMethods.parse(Files.readString(manifestPath))
        val v = (m \ "snapshotVersion") match {
          case JInt(n) => n.toLong
          case JLong(n) => n
          case _ => 0L
        }
        if (v > 0 && Files.exists(snapshotPath(v)))
          CatalogJson.read(Files.readString(snapshotPath(v)))
        else GraphCatalog.empty
      } else GraphCatalog.empty
    if (!Files.exists(logPath)) base
    else Files.readAllLines(logPath).asScala.foldLeft(base) { (cat, line) =>
      if (line.isBlank) cat
      else {
        val j = JsonMethods.parse(line)
        val v = (j \ "version") match {
          case JInt(n) => n.toLong
          case JLong(n) => n
          case _ => 0L
        }
        if (v <= cat.version) cat
        else {
          val JString(ddl) = (j \ "ddl"): @unchecked
          Parser.parse(ddl).foldLeft(cat)(Ddl.apply)
        }
      }
    }
  }

  /** Time-travel load: the catalog AS OF `version` — the DDL log is the
    * full history, so any past schema is a bounded replay of entries ≤
    * version from the empty catalog (snapshots only accelerate the
    * LATEST load; history reads take the log path, which is exactly the
    * WAL-reconstruction contract of the reference's commit log). Out-of
    * -range versions clamp: 0 → empty, ≥ head → head.
    */
  def loadAt(version: Long): GraphCatalog = {
    if (!Files.exists(logPath)) return GraphCatalog.empty
    Files.readAllLines(logPath).asScala
      .foldLeft(GraphCatalog.empty) { (cat, line) =>
        if (line.isBlank) cat
        else {
          val j = JsonMethods.parse(line)
          val v = (j \ "version") match {
            case JInt(n) => n.toLong
            case JLong(n) => n
            case _ => 0L
          }
          if (v > version || v <= cat.version) cat
          else {
            val JString(ddl) = (j \ "ddl"): @unchecked
            Parser.parse(ddl).foldLeft(cat)(Ddl.apply)
          }
        }
      }
  }
}

/** Hand-mapped JSON codec for the catalog (stable on-disk schema that
  * doesn't depend on Scala case-class reflection details).
  */
object CatalogJson {

  def write(cat: GraphCatalog): String =
    compact(render(JObject(
      "version" -> JLong(cat.version),
      "nodes" -> JArray(cat.nodes.values.toList.sortBy(_.name).map(nodeJson)),
      "edges" -> JArray(cat.edges.values.toList.sortBy(_.name).map(edgeJson)))))

  private def typeJson(t: Ast.TypeSpec): JValue = t match {
    case Ast.TypeSpec(_, Some(elem), _) =>
      JObject("base" -> JString("array"), "elem" -> typeJson(elem))
    case Ast.TypeSpec(_, None, vals) if vals.nonEmpty =>
      JObject("base" -> JString("enum"), "values" -> JArray(vals.toList.map(JString)))
    case Ast.TypeSpec(base, _, _) => JObject("base" -> JString(baseName(base)))
  }

  private def baseName(b: Ast.Base): String = b match {
    case Ast.Base.Str => "string"
    case Ast.Base.Text => "text"
    case Ast.Base.Int => "int"
    case Ast.Base.Float => "float"
    case Ast.Base.Bool => "bool"
    case Ast.Base.Uuid => "uuid"
    case Ast.Base.Date => "date"
    case Ast.Base.Time => "time"
    case Ast.Base.DateTime => "datetime"
    case Ast.Base.Json => "json"
    case Ast.Base.Blob => "blob"
  }

  private def baseOf(s: String): Ast.Base = s match {
    case "string" => Ast.Base.Str
    case "text" => Ast.Base.Text
    case "int" => Ast.Base.Int
    case "float" => Ast.Base.Float
    case "bool" => Ast.Base.Bool
    case "uuid" => Ast.Base.Uuid
    case "date" => Ast.Base.Date
    case "time" => Ast.Base.Time
    case "datetime" => Ast.Base.DateTime
    case "json" => Ast.Base.Json
    case "blob" => Ast.Base.Blob
    case other => throw DdlError(s"unknown base type in snapshot: $other")
  }

  private def litKindName(k: Ast.LitKind): String = k match {
    case Ast.LitKind.Str => "str"
    case Ast.LitKind.Num => "num"
    case Ast.LitKind.Bool => "bool"
    case Ast.LitKind.Null => "null"
  }

  private def litKindOf(s: String): Ast.LitKind = s match {
    case "str" => Ast.LitKind.Str
    case "num" => Ast.LitKind.Num
    case "bool" => Ast.LitKind.Bool
    case "null" => Ast.LitKind.Null
    case other => throw DdlError(s"unknown literal kind in snapshot: $other")
  }

  private def cmpOpOf(s: String): Ast.CmpOp = s match {
    case "=" => Ast.CmpOp.Eq
    case "!=" => Ast.CmpOp.Ne
    case "<" => Ast.CmpOp.Lt
    case "<=" => Ast.CmpOp.Le
    case ">" => Ast.CmpOp.Gt
    case ">=" => Ast.CmpOp.Ge
    case other => throw DdlError(s"unknown CHECK operator in snapshot: $other")
  }

  private def checkJson(c: Ast.CheckCmp): JValue = JObject(
    "field" -> JString(c.field),
    "op" -> JString(c.op.sym),
    "kind" -> JString(litKindName(c.value.kind)),
    "value" -> JString(c.value.text),
    "rhsField" -> c.rhsField.map(JString).getOrElse(JNull))

  private def readCheck(j: JValue): Ast.CheckCmp = Ast.CheckCmp(
    str(j \ "field"), cmpOpOf(str(j \ "op")),
    Ast.Literal(litKindOf(str(j \ "kind")), str(j \ "value")),
    rhsField = (j \ "rhsField") match {
      case JString(s) => Some(s)
      case _ => None
    })

  /** Check DNF codec: nested arrays (outer OR, inner AND). A LEGACY
    * flat array of atom objects (pre-OR snapshots: an implicit
    * conjunction) reads as a single-disjunct DNF, so existing
    * snapshots keep loading unchanged.
    */
  private def readCheckDnf(j: JValue): Seq[Seq[Ast.CheckCmp]] = j match {
    case JArray(Nil) => Nil
    case JArray(xs) if xs.forall(_.isInstanceOf[JArray]) =>
      xs.map { case JArray(cs) => cs.map(readCheck); case _ => Nil }
    case JArray(xs) => Seq(xs.map(readCheck)) // legacy conjunction
    case _ => Nil
  }

  // `check` and `index` MUST ride the snapshot: a catalog loaded from
  // snapshot (bootFrom / load at the manifest version — the path that
  // SKIPS DDL-log replay) would otherwise silently stop enforcing CHECK
  // and lose the scripted index layout. Absent keys read as empty/false
  // so pre-existing snapshots keep loading.
  private def fieldJson(f: FieldSpec): JValue = JObject(
    "name" -> JString(f.name),
    "type" -> typeJson(f.tpe),
    "unique" -> JBool(f.unique),
    "notNull" -> JBool(f.notNull),
    "default" -> f.defaultRaw.map(JString).getOrElse(JNull),
    "check" -> JArray(f.check.toList.map(conj =>
      JArray(conj.toList.map(checkJson)))),
    "index" -> JBool(f.index))

  private def layoutJson(l: LayoutSpec): JValue = JObject(
    "partitionBy" -> JArray(l.partitionBy.toList.map(JString)),
    "bucketBy" -> l.bucketBy.map { case (n, cols) =>
      JObject("buckets" -> JInt(n), "cols" -> JArray(cols.toList.map(JString)))
    }.getOrElse(JNull),
    "sortBy" -> JArray(l.sortBy.toList.map(JString)))

  private def nodeJson(n: NodeTypeDef): JValue = JObject(
    "name" -> JString(n.name),
    "fields" -> JArray(n.fields.toList.map(fieldJson)),
    "pk" -> JArray(n.pk.toList.map(JString)),
    "layout" -> layoutJson(n.layout))

  private def edgeJson(e: EdgeTypeDef): JValue = JObject(
    "name" -> JString(e.name),
    "from" -> JObject("label" -> JString(e.from.label), "many" -> JBool(e.from.many)),
    "to" -> JObject("label" -> JString(e.to.label), "many" -> JBool(e.to.many)),
    "props" -> JArray(e.props.toList.map(fieldJson)),
    "layout" -> layoutJson(e.layout))

  def read(json: String): GraphCatalog = {
    val j = JsonMethods.parse(json)
    val version = (j \ "version") match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case _ => 0L
    }
    val nodes = (j \ "nodes") match {
      case JArray(ns) => ns.map(readNode).map(n => n.name -> n).toMap
      case _ => Map.empty[String, NodeTypeDef]
    }
    val edges = (j \ "edges") match {
      case JArray(es) => es.map(readEdge).map(e => e.name -> e).toMap
      case _ => Map.empty[String, EdgeTypeDef]
    }
    GraphCatalog(version, nodes, edges)
  }

  private def str(j: JValue): String = j match {
    case JString(s) => s
    case other => throw DdlError(s"expected string, got $other")
  }

  private def readType(j: JValue): Ast.TypeSpec = str(j \ "base") match {
    case "array" => Ast.TypeSpec(Ast.Base.Str, elem = Some(readType(j \ "elem")))
    case "enum" =>
      val JArray(vs) = (j \ "values"): @unchecked
      Ast.TypeSpec(Ast.Base.Str, enumVals = vs.map(str))
    case b => Ast.TypeSpec(baseOf(b))
  }

  private def readField(j: JValue): FieldSpec = FieldSpec(
    name = str(j \ "name"),
    tpe = readType(j \ "type"),
    unique = (j \ "unique") == JBool(true),
    notNull = (j \ "notNull") == JBool(true),
    defaultRaw = (j \ "default") match {
      case JString(s) => Some(s)
      case _ => None
    },
    check = readCheckDnf(j \ "check"),
    index = (j \ "index") == JBool(true))

  private def readLayout(j: JValue): LayoutSpec = LayoutSpec(
    partitionBy = (j \ "partitionBy") match {
      case JArray(xs) => xs.map(str)
      case _ => Nil
    },
    bucketBy = (j \ "bucketBy") match {
      case JObject(_) =>
        val n = (j \ "bucketBy" \ "buckets") match {
          case JInt(x) => x.toInt
          case _ => 0
        }
        val JArray(cols) = (j \ "bucketBy" \ "cols"): @unchecked
        Some((n, cols.map(str)))
      case _ => None
    },
    sortBy = (j \ "sortBy") match {
      case JArray(xs) => xs.map(str)
      case _ => Nil
    })

  private def readNode(j: JValue): NodeTypeDef = {
    val JArray(fs) = (j \ "fields"): @unchecked
    val pk = (j \ "pk") match {
      case JArray(xs) => xs.map(str)
      case _ => Nil
    }
    NodeTypeDef(str(j \ "name"), fs.map(readField), pk, readLayout(j \ "layout"))
  }

  private def readEdge(j: JValue): EdgeTypeDef = {
    val JArray(ps) = (j \ "props"): @unchecked
    EdgeTypeDef(
      str(j \ "name"),
      EndpointDef(str(j \ "from" \ "label"), (j \ "from" \ "many") == JBool(true)),
      EndpointDef(str(j \ "to" \ "label"), (j \ "to" \ "many") == JBool(true)),
      ps.map(readField),
      readLayout(j \ "layout"))
  }
}
