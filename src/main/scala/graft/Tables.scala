package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated testdata layout
  * (`<sfDir>/<table>.parquet`). All graft operators read through here so
  * that scans stay plain parquet relations — Catalyst gets full predicate
  * pushdown and column pruning on every query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads via
    // spark.sql.legacy.parquet.nanosAsLong (set in every graft session).
    // The generated data is µs-aligned, so long-nanos → µs timestamp is
    // lossless and matches DuckDB's view of the column.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
