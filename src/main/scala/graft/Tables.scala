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
    // The generator has emitted timestamps two ways across driver
    // versions: TIMESTAMP(NANOS), readable only as long via
    // spark.sql.legacy.parquet.nanosAsLong (converted below), and
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 would
    // infer as TIMESTAMP_NTZ — every graft session disables
    // spark.sql.parquet.inferTimestampNTZ.enabled so those scan
    // directly as TimestampType (identical instants under the UTC
    // session, matching DuckDB's naive view) WITHOUT a cast above the
    // scan that would block predicate pushdown on date columns. A cast
    // is kept as defense for sessions missing the conf.
    val typed = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.LongType if name == "events" && f.name == "ts" =>
          acc.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          acc.withColumn(f.name, acc(f.name).cast(org.apache.spark.sql.types.TimestampType))
        case _ => acc
      }
    }
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
