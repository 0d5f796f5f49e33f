package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-inspection harness for local iteration (not part of
  * the driver contract).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p_dedup_simhash")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // time construction + count together: iterative queries materialize
    // per-round checkpoints while the DataFrame is being BUILT, so a
    // count-only timer reads ~0 for exactly the queries worth measuring.
    // Two passes: pass 2 reuses pinned materialized views (the bench
    // steady-state); pass 1 includes view construction (cold).
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val n = df.count()
      println(s"pass$pass rows=$n in ${(System.nanoTime() - t0) / 1e9}s")
      PinnedRdds.dropUnpinned(spark)
    }
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
