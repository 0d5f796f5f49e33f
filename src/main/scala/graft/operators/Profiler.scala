package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiler — the SUMMARIZE / release-datasheet
  * introspection face (reference: `catalog/registry.go` DESCRIBE
  * surface, generalized to data statistics): for every column, null
  * count, distinct count, numeric min/max, and mean string length, in
  * ONE aggregation over the table, emitted long-format (one row per
  * column).
  *
  * Shape discipline: all per-column statistics are aggregates of the
  * same scan, so Catalyst plans ONE pass; the only row-multiplying
  * construct is the Expand that multi-`countDistinct` plans (one
  * projection per distinct column + one for the plain aggregates),
  * which is the standard exact-distinct trade. At 100 TB pass
  * `exact = false` and the Expand disappears entirely: HLL++ partials
  * (`approx_count_distinct`) merge like any agg — same output schema,
  * ±2% on n_distinct, which is what a datasheet needs. The exact form
  * exists because the driver gate hashes values; the approx form is the
  * deployment default.
  *
  * Floats are round-sealed (min/max 4dp, avg_len 2dp) and every other
  * output is an exact integer, per the repo's float-parity rule.
  */
object Profiler {

  private def canonicalType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "bigint"
    case FloatType | DoubleType => "double"
    case _: DecimalType => "decimal"
    case StringType => "string"
    case TimestampType | TimestampNTZType => "timestamp"
    case DateType => "date"
    case BooleanType => "boolean"
    case BinaryType => "binary"
    case _: ArrayType => "array"
    case _: MapType => "map"
    case _: StructType => "struct"
    case other => other.typeName
  }

  def summarize(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot summarize a zero-column table")
    val aggs = fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val numeric = f.dataType.isInstanceOf[NumericType]
      val str = f.dataType == StringType
      // maps are unorderable: countDistinct fails analysis on them, so
      // the distinct stat is null for map columns (every other stat of
      // the row still computes)
      val distinctable = !f.dataType.isInstanceOf[MapType]
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nn"),
        (if (!distinctable) lit(null).cast("long")
         else if (exact) countDistinct(c)
         else approx_count_distinct(c))
          .as(s"${f.name}__nd"),
        (if (numeric) round(min(c).cast("double"), 4)
         else lit(null).cast("double")).as(s"${f.name}__mn"),
        (if (numeric) round(max(c).cast("double"), 4)
         else lit(null).cast("double")).as(s"${f.name}__mx"),
        (if (str) round(avg(length(c)), 2)
         else lit(null).cast("double")).as(s"${f.name}__al"))
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single stats row to long format: stack is a pure
    // projection of the one-row aggregate — no second pass
    val stackArgs = fields.map { f =>
      // escape identifiers: a quote/backtick in a column name must not
      // break (or inject into) the generated stack() expression
      val nameLit = f.name.replace("'", "''")
      val q = f.name.replace("`", "``")
      s"'$nameLit', '${canonicalType(f.dataType)}', `${q}__nn`, `${q}__nd`, " +
        s"`${q}__mn`, `${q}__mx`, `${q}__al`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${fields.length}, $stackArgs) AS " +
        "(col_name, dtype, n_null, n_distinct, min_d, max_d, avg_len)",
      "__n_rows AS n_rows")
      .select(col("col_name"), col("dtype"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_d"), col("max_d"), col("avg_len"))
  }
}
