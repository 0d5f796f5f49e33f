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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println(s"rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
