package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * Each module under `graft.queries` contributes `QueryDef`s (Spark plan +
  * DuckDB oracle SQL); this object aggregates them for the driver's
  * correctness gate and bench loop.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.GraphOps.defs ++
      graft.queries.Dml.defs ++
      graft.queries.Pipeline.defs ++
      graft.queries.Streaming.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
