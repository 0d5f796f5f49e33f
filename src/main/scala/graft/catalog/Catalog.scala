package graft.catalog

import graft.lang.Ast
import org.apache.spark.sql.types._

/** Typed, versioned catalog (reference: /root/reference/catalog/types.go
  * — same model re-expressed immutably: every DDL application returns a
  * new catalog with version+1, so snapshots are trivially consistent).
  */
final case class GraphCatalog(
    version: Long,
    nodes: Map[String, NodeTypeDef],
    edges: Map[String, EdgeTypeDef])

object GraphCatalog {
  val empty: GraphCatalog = GraphCatalog(0L, Map.empty, Map.empty)
}

final case class NodeTypeDef(
    name: String,
    fields: Seq[FieldSpec],
    pk: Seq[String],
    /** Spark-first analogue of per-field indexes (reference
      * catalog/types.go:66 IndexSpec): a physical layout hint the writer
      * applies — partition columns + bucket/sort spec.
      */
    layout: LayoutSpec = LayoutSpec()) {
  def field(n: String): Option[FieldSpec] = fields.find(_.name == n)
}

final case class EdgeTypeDef(
    name: String,
    from: EndpointDef,
    to: EndpointDef,
    props: Seq[FieldSpec],
    layout: LayoutSpec = LayoutSpec()) {
  def prop(n: String): Option[FieldSpec] = props.find(_.name == n)
}

final case class EndpointDef(label: String, many: Boolean)

/** Physical layout spec per label: how the parquet table is partitioned
  * / bucketed / sorted. Replaces the reference's in-memory hash indexes
  * with the distributed equivalents that actually matter at 100 TB
  * (partition pruning, shuffle-free co-located joins, rowgroup skipping).
  */
final case class LayoutSpec(
    partitionBy: Seq[String] = Nil,
    bucketBy: Option[(Int, Seq[String])] = None,
    sortBy: Seq[String] = Nil)

final case class FieldSpec(
    name: String,
    tpe: Ast.TypeSpec,
    unique: Boolean = false,
    notNull: Boolean = false,
    defaultRaw: Option[String] = None,
    /** CHECK constraint in DNF: outer Seq is OR, inner Seq is AND. */
    check: Seq[Seq[Ast.CheckCmp]] = Nil,
    /** Scripted INDEX option (reference catalog/types.go:66 IndexSpec) —
      * the DDL applier folds indexed fields into the label's LayoutSpec.
      */
    index: Boolean = false)

object Types {

  /** grapho TypeSpec → Spark DataType (SURVEY §2.1 row 6). `time` maps
    * to a string column ("HH:mm:ss"): Spark has no time-of-day type.
    * `uuid`/`json` are strings with semantic validation left to
    * constraints; `blob` is binary.
    */
  def toSpark(t: Ast.TypeSpec): DataType = t match {
    case Ast.TypeSpec(_, Some(elem), _) => ArrayType(toSpark(elem))
    case Ast.TypeSpec(base, None, _) => base match {
      case Ast.Base.Str | Ast.Base.Text | Ast.Base.Uuid | Ast.Base.Json |
           Ast.Base.Time => StringType
      case Ast.Base.Int => LongType
      case Ast.Base.Float => DoubleType
      case Ast.Base.Bool => BooleanType
      case Ast.Base.Date => DateType
      case Ast.Base.DateTime => TimestampType
      case Ast.Base.Blob => BinaryType
    }
  }

  def toSchema(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(f => StructField(f.name, toSpark(f.tpe), nullable = !f.notNull)))
}

final case class DdlError(msg: String) extends RuntimeException(msg)

/** DDL applier: Ast DDL statements → next catalog version (reference:
  * /root/reference/catalog/ddl.go Apply*). Validation mirrors the
  * reference: duplicate labels/fields rejected, unknown labels/fields
  * rejected, PK fields must exist, edge endpoints must name known node
  * types.
  */
object Ddl {

  def apply(cat: GraphCatalog, stmt: Ast.Stmt): GraphCatalog = stmt match {
    case s: Ast.CreateNode => createNode(cat, s)
    case s: Ast.CreateEdge => createEdge(cat, s)
    case s: Ast.AlterNode => alterNode(cat, s)
    case s: Ast.AlterEdge => alterEdge(cat, s)
    case s: Ast.DropNode => dropNode(cat, s.name)
    case s: Ast.DropEdge => dropEdge(cat, s.name)
    case other => throw DdlError(s"not a DDL statement: $other")
  }

  private def bump(cat: GraphCatalog): GraphCatalog = cat.copy(version = cat.version + 1)

  private def toFieldSpec(fd: Ast.FieldDef): FieldSpec =
    FieldSpec(fd.name, fd.tpe, unique = fd.unique, notNull = fd.notNull || fd.primaryKey,
      defaultRaw = fd.default.map(_.text), check = fd.check, index = fd.index)

  /** Default bucket count for scripted INDEX layouts — sized to the
    * session's parallelism contract (spark.sql.shuffle.partitions=32 in
    * this deployment); at cluster scale a deployment overrides the
    * LayoutSpec through the API after CREATE.
    */
  val IndexBuckets = 32

  /** Fold scripted per-field indexes into the label's physical layout
    * (the Spark-first meaning of the reference's IndexSpec): the FIRST
    * indexed field becomes the bucket key (hash-index analogue — co-
    * located joins, one-bucket point reads), the remaining indexed
    * fields become the within-partition sort (range-index analogue —
    * parquet rowgroup min/max skipping). With no indexed fields the
    * existing (API-set) layout is kept, filtered to columns that still
    * exist so a DROP of a layout column never leaves the writer
    * repartitioning on a ghost.
    */
  private def reconcileLayout(old: LayoutSpec, fields: Seq[FieldSpec]): LayoutSpec = {
    val names = fields.map(_.name).toSet
    val indexed = fields.filter(_.index).map(_.name)
    if (indexed.nonEmpty)
      LayoutSpec(partitionBy = old.partitionBy.filter(names),
        bucketBy = Some((IndexBuckets, Seq(indexed.head))),
        sortBy = indexed.tail)
    else LayoutSpec(
      partitionBy = old.partitionBy.filter(names),
      bucketBy = old.bucketBy.filter(_._2.forall(names)),
      sortBy = old.sortBy.filter(names))
  }

  /** DDL-time CHECK validation: every constraint a CREATE/ALTER carries
    * must be enforceable before it is accepted (a CHECK that throws on
    * every subsequent INSERT is a schema bug, not a data bug) —
    * referenced sibling fields exist, the field types are comparable
    * (blob/array have no CHECK ordering), and the literal coerces to
    * the referenced field's type. Numeric literals follow the shared
    * lexical rule (fractional literal against an int field compares as
    * double — same rule at insert time and in the batch finder).
    */
  private def validateChecks(label: String, fields: Seq[FieldSpec]): Unit = {
    val byName = fields.map(f => f.name -> f).toMap
    def comparableType(f: FieldSpec, c: Ast.CheckCmp, name: String): DataType = {
      val target = byName.getOrElse(name, throw DdlError(
        s"CHECK on $label.${f.name} references unknown field '$name'"))
      val st = Types.toSpark(target.tpe)
      st match {
        case BinaryType | _: ArrayType => throw DdlError(
          s"CHECK on $label.${f.name}: field '$name' of type " +
            s"${Ast.renderType(target.tpe)} is not comparable")
        case _ => st
      }
    }
    for (f <- fields; disj <- f.check; c <- disj) {
      val st = comparableType(f, c, c.field)
      c.rhsField.foreach { r =>
        val rt = comparableType(f, c, r)
        val numeric = Set[DataType](LongType, DoubleType)
        val compatible = st == rt || (numeric(st) && numeric(rt))
        if (!compatible) throw DdlError(
          s"CHECK on $label.${f.name}: fields '${c.field}' and '$r' " +
            "have incomparable types")
      }
      if (c.rhsField.isEmpty) c.value.kind match {
        case Ast.LitKind.Null => () // a NULL atom never fails a row
        case Ast.LitKind.Num => st match {
          case LongType | DoubleType => ()
          case _ => throw DdlError(
            s"CHECK on $label.${f.name}: numeric literal against non-numeric field '${c.field}'")
        }
        case Ast.LitKind.Bool => st match {
          case BooleanType => ()
          case _ => throw DdlError(
            s"CHECK on $label.${f.name}: boolean literal against non-boolean field '${c.field}'")
        }
        case Ast.LitKind.Str => st match {
          case StringType => ()
          case DateType =>
            try java.sql.Date.valueOf(c.value.text) catch {
              case _: IllegalArgumentException => throw DdlError(
                s"CHECK on $label.${f.name}: '${c.value.text}' is not a date")
            }
          case TimestampType =>
            try java.sql.Timestamp.valueOf(c.value.text.replace("T", " ")) catch {
              case _: IllegalArgumentException => throw DdlError(
                s"CHECK on $label.${f.name}: '${c.value.text}' is not a timestamp")
            }
          case _ => throw DdlError(
            s"CHECK on $label.${f.name}: string literal against incompatible field '${c.field}'")
        }
      }
    }
  }

  /** Scalar per the reference's isScalarType (ddl.go:171): everything
    * except arrays, enums, json, and blob.
    */
  private def isScalar(t: Ast.TypeSpec): Boolean =
    t.elem.isEmpty && t.enumVals.isEmpty && (t.base match {
      case Ast.Base.Json | Ast.Base.Blob => false
      case _ => true
    })

  /** Per-field sanity mirrored from validateCreateNode / validateAlter*
    * (ddl.go:132,345,453): a NOT NULL field cannot default to null, and
    * a primary key must be a scalar type.
    */
  private def validateField(fd: Ast.FieldDef): Unit = {
    if (fd.notNull && fd.default.exists(_.kind == Ast.LitKind.Null))
      throw DdlError(s"field ${fd.name} is NOT NULL but defaults to null")
    if (fd.primaryKey && !isScalar(fd.tpe))
      throw DdlError(s"primary key ${fd.name} must be a scalar type")
  }

  def createNode(cat: GraphCatalog, s: Ast.CreateNode): GraphCatalog = {
    if (cat.nodes.contains(s.name)) throw DdlError(s"node type exists: ${s.name}")
    if (s.fields.isEmpty) throw DdlError("node must define at least one field")
    val dup = s.fields.groupBy(_.name).collectFirst { case (n, fs) if fs.size > 1 => n }
    dup.foreach(n => throw DdlError(s"duplicate field: $n"))
    s.fields.foreach(validateField)
    val pk = s.fields.filter(_.primaryKey).map(_.name)
    if (pk.size > 1) throw DdlError("multiple PRIMARY KEY fields (use ALTER ... SET PRIMARY KEY for a composite key)")
    val specs = s.fields.map(toFieldSpec)
    validateChecks(s.name, specs)
    val nt = NodeTypeDef(s.name, specs, pk,
      layout = reconcileLayout(LayoutSpec(), specs))
    bump(cat.copy(nodes = cat.nodes + (s.name -> nt)))
  }

  def createEdge(cat: GraphCatalog, s: Ast.CreateEdge): GraphCatalog = {
    if (cat.edges.contains(s.name)) throw DdlError(s"edge type exists: ${s.name}")
    Seq(s.from.label, s.to.label).foreach { l =>
      if (!cat.nodes.contains(l)) throw DdlError(s"unknown node type in endpoint: $l")
    }
    val dup = s.props.groupBy(_.name).collectFirst { case (n, fs) if fs.size > 1 => n }
    dup.foreach(n => throw DdlError(s"duplicate edge prop: $n"))
    s.props.foreach(validateField)
    val specs = s.props.map(toFieldSpec)
    validateChecks(s.name, specs)
    val et = EdgeTypeDef(s.name,
      EndpointDef(s.from.label, s.from.card == Ast.Cardinality.Many),
      EndpointDef(s.to.label, s.to.card == Ast.Cardinality.Many),
      specs, layout = reconcileLayout(LayoutSpec(), specs))
    bump(cat.copy(edges = cat.edges + (s.name -> et)))
  }

  def alterNode(cat: GraphCatalog, s: Ast.AlterNode): GraphCatalog = {
    val nt = cat.nodes.getOrElse(s.name, throw DdlError(s"unknown node type: ${s.name}"))
    val updated = s.action match {
      case Ast.AlterNodeAction.AddField(fd) =>
        if (nt.field(fd.name).isDefined) throw DdlError(s"field exists: ${fd.name}")
        validateField(fd)
        nt.copy(fields = nt.fields :+ toFieldSpec(fd))
      case Ast.AlterNodeAction.DropField(n) =>
        if (nt.field(n).isEmpty) throw DdlError(s"unknown field: $n")
        if (nt.pk.contains(n)) throw DdlError(s"cannot drop primary key field: $n")
        nt.copy(fields = nt.fields.filterNot(_.name == n))
      case Ast.AlterNodeAction.ModifyField(fd) =>
        if (nt.field(fd.name).isEmpty) throw DdlError(s"unknown field: ${fd.name}")
        validateField(fd)
        nt.copy(fields = nt.fields.map(f => if (f.name == fd.name) toFieldSpec(fd) else f))
      case Ast.AlterNodeAction.SetPrimaryKey(fs) =>
        fs.foreach { n =>
          val f = nt.field(n).getOrElse(throw DdlError(s"unknown pk field: $n"))
          // reference ddl.go SET_PRIMARY_KEY: key fields must be scalar
          if (!isScalar(f.tpe)) throw DdlError(s"primary key $n must be a scalar type")
        }
        nt.copy(pk = fs)
    }
    validateChecks(s.name, updated.fields)
    val relaid = updated.copy(layout = reconcileLayout(updated.layout, updated.fields))
    bump(cat.copy(nodes = cat.nodes + (s.name -> relaid)))
  }

  def alterEdge(cat: GraphCatalog, s: Ast.AlterEdge): GraphCatalog = {
    val et = cat.edges.getOrElse(s.name, throw DdlError(s"unknown edge type: ${s.name}"))
    val updated = s.action match {
      case Ast.AlterEdgeAction.AddProp(fd) =>
        if (et.prop(fd.name).isDefined) throw DdlError(s"prop exists: ${fd.name}")
        validateField(fd)
        et.copy(props = et.props :+ toFieldSpec(fd))
      case Ast.AlterEdgeAction.DropProp(n) =>
        if (et.prop(n).isEmpty) throw DdlError(s"unknown prop: $n")
        et.copy(props = et.props.filterNot(_.name == n))
      case Ast.AlterEdgeAction.ModifyProp(fd) =>
        if (et.prop(fd.name).isEmpty) throw DdlError(s"unknown prop: ${fd.name}")
        validateField(fd)
        et.copy(props = et.props.map(f => if (f.name == fd.name) toFieldSpec(fd) else f))
      case Ast.AlterEdgeAction.SetEndpoints(from, to) =>
        Seq(from.label, to.label).foreach { l =>
          if (!cat.nodes.contains(l)) throw DdlError(s"unknown node type in endpoint: $l")
        }
        et.copy(
          from = EndpointDef(from.label, from.card == Ast.Cardinality.Many),
          to = EndpointDef(to.label, to.card == Ast.Cardinality.Many))
    }
    validateChecks(s.name, updated.props)
    val relaid = updated.copy(layout = reconcileLayout(updated.layout, updated.props))
    bump(cat.copy(edges = cat.edges + (s.name -> relaid)))
  }

  def dropNode(cat: GraphCatalog, name: String): GraphCatalog = {
    if (!cat.nodes.contains(name)) throw DdlError(s"unknown node type: $name")
    val used = cat.edges.values.find(e => e.from.label == name || e.to.label == name)
    used.foreach(e => throw DdlError(s"node type $name used by edge ${e.name}"))
    bump(cat.copy(nodes = cat.nodes - name))
  }

  def dropEdge(cat: GraphCatalog, name: String): GraphCatalog = {
    if (!cat.edges.contains(name)) throw DdlError(s"unknown edge type: $name")
    bump(cat.copy(edges = cat.edges - name))
  }
}
