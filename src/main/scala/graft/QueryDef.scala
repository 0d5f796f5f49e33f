package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle query over the
  * same parquet tables. Modules contribute `Seq[QueryDef]`; SparkEntry
  * aggregates them into the driver contract.
  *
  * Float-output parity rule: every floating-point output column is
  * rounded (usually 2-4 dp) in BOTH the Spark plan and the oracle SQL so
  * that summation-order ULP differences between engines can't flip the
  * driver's value hash.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, fn: (SparkSession, String) => DataFrame, oracleSql: String): QueryDef =
    QueryDef(name, fn, Some(oracleSql))
  def rowsOnly(name: String, fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
