package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated testdata layout
  * (`<sfDir>/<table>.parquet`). All graft operators read through here so
  * that scans stay plain parquet relations — Catalyst gets full predicate
  * pushdown and column pruning on every query (both push through the
  * fan-out exchange below).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Scan partition count per table path, memoized — computing it costs
    * one physical planning pass, and load() is called on every query
    * construction.
    */
  private val scanParts = scala.collection.concurrent.TrieMap.empty[String, Int]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads via
    // spark.sql.legacy.parquet.nanosAsLong (set in every graft session).
    // The generated data is µs-aligned, so long-nanos → µs timestamp is
    // lossless and matches DuckDB's view of the column.
    val typed =
      if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else df
    // Single-row-group files scan as ONE task, serializing every map-side
    // stage no matter the core count. That only matters for the tables
    // with heavy per-row CPU (shingling/hashing text, vector math) — fan
    // those out to cluster width; at real scale multi-file tables already
    // split past defaultParallelism and this is a no-op. The relational
    // tables stay plain scans: their first shuffle parallelizes anyway,
    // and an unconditional exchange would tax every join query.
    val parallelism = spark.sparkContext.defaultParallelism
    if (cpuHeavy(name)) {
      val nParts = scanParts.getOrElseUpdate(s"$sfDir/$name", typed.rdd.getNumPartitions)
      if (nParts < parallelism) typed.repartition(parallelism) else typed
    } else typed
  }

  private def cpuHeavy(name: String): Boolean =
    name == "documents" || name == "embeddings"
}
