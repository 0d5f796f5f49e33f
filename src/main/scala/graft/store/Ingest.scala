package graft.store

import graft.catalog.{EdgeTypeDef, NodeTypeDef, Types}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Catalog-schema-enforced ingest: read a label's table from any
  * Spark-supported columnar/text source with the schema DERIVED FROM THE
  * CATALOG, not inferred. Inference is banned on the ingest path by
  * design — at 100 TB a schema-inference pass is a full extra scan, and
  * an inferred type that drifts from the catalog (int column that
  * happens to look boolean, date-like strings) corrupts every
  * downstream constraint check silently. The catalog is the one source
  * of truth; files either conform or rows surface in
  * [[Constraints]] violation finders.
  *
  * CSV/JSON read with explicit schema + PERMISSIVE mode: malformed rows
  * become nulls, which the NOT NULL violation finder then reports —
  * ingest never throws mid-scan on a bad row (a single corrupt record
  * must not kill a 100 TB load; it must be quarantinable by query).
  * Note Spark file sources force every read field nullable regardless
  * of the requested schema; catalog nullability is enforced by the
  * constraint finders, not the scan.
  */
object Ingest {

  private def reader(spark: SparkSession, schema: StructType, format: String,
      options: Map[String, String]) = {
    val base = spark.read.options(options).schema(schema)
    format match {
      case "parquet" => (path: String) => base.parquet(path)
      case "orc" => (path: String) => base.orc(path)
      case "csv" => (path: String) => base.option("header", "true").csv(path)
      case "json" => (path: String) => base.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported ingest format: $other (parquet, orc, csv, json)")
    }
  }

  /** Node-table schema: `_id: long` + the catalog's typed fields. */
  def nodeSchema(nt: NodeTypeDef): StructType =
    StructType(StructField("_id", LongType, nullable = false) +:
      Types.toSchema(nt.fields).fields.toSeq)

  /** Edge-table schema: `_id/_src/_dst: long` + typed props. */
  def edgeSchema(et: EdgeTypeDef): StructType =
    StructType(
      StructField("_id", LongType, nullable = false) +:
      StructField("_src", LongType, nullable = false) +:
      StructField("_dst", LongType, nullable = false) +:
      Types.toSchema(et.props).fields.toSeq)

  def readNodes(spark: SparkSession, nt: NodeTypeDef, path: String,
      format: String = "parquet", options: Map[String, String] = Map.empty): DataFrame =
    reader(spark, nodeSchema(nt), format, options)(path)

  def readEdges(spark: SparkSession, et: EdgeTypeDef, path: String,
      format: String = "parquet", options: Map[String, String] = Map.empty): DataFrame =
    reader(spark, edgeSchema(et), format, options)(path)
}
