package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins Spark's late-row drop rule for windowed streaming aggregation —
  * the semantics s_late_data's oracle replays in SQL:
  *
  *  - the watermark in force during batch i is max(event time over
  *    batches < i) − delay (updates land at batch boundaries);
  *  - an input row is DROPPED iff its window END ≤ that watermark
  *    (inclusive at the exact boundary — probed explicitly);
  *  - a finalized window emits (append mode) once the in-force
  *    watermark passes its end, which is why the face appends two
  *    far-future sentinel batches: the first advances the watermark
  *    past every real window, the second gives the engine a batch to
  *    evict them in.
  *
  * Also pins the pushdown hazard that shaped the operator: a pre-agg
  * filter on the sentinel type would be pushed BELOW the watermark node
  * and the sentinels would never advance it — sentinels must flow into
  * the aggregation and be filtered from the SINK.
  */
class WatermarkProbeSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("late rows drop iff window end ≤ the batch's in-force watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val agg = source.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_probe")
      .outputMode("append").start()
    try {
      // batch 1: max = 10:00 → wm for batch 2 = 09:00
      source.addData(Ev(1, ts(0, 30), 1, "a", 0), Ev(2, ts(2, 30), 1, "a", 0),
        Ev(3, ts(10, 0), 1, "a", 0))
      q.processAllAvailable()
      // batch 2 vs wm 09:00: [4,6) end 06 ≤ wm → drop; [6,8) end 08 ≤ wm
      // → drop; [8,10) end 10 > wm → keep
      source.addData(Ev(10, ts(5, 30), 1, "b", 0), Ev(11, ts(7, 30), 1, "b", 0),
        Ev(12, ts(8, 30), 1, "b", 0))
      q.processAllAvailable()
      source.addData(Ev(99, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        1, "__flush", 0))
      q.processAllAvailable()
      source.addData(Ev(100, java.sql.Timestamp.valueOf("2024-02-02 00:00:00"),
        1, "__flush", 0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("wm_probe")
      .filter(col("event_type") =!= "__flush").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((ts(0), "a", 1L), (ts(2), "a", 1L),
      (ts(8), "b", 1L), (ts(10), "a", 1L)))
  }

  test("the exact boundary window_end == watermark drops (inclusive ≤)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val agg = source.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_probe2")
      .outputMode("append").start()
    try {
      // batch 1: max = 05:00 → wm = 04:00
      source.addData(Ev(1, ts(5, 0), 1, "a", 0))
      q.processAllAvailable()
      // [3,4) ends EXACTLY at wm 04:00 → dropped; [4,5) end 05:00 → kept
      source.addData(Ev(2, ts(3, 30), 1, "c", 0), Ev(3, ts(4, 30), 1, "d", 0))
      q.processAllAvailable()
      source.addData(Ev(99, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        1, "__flush", 0))
      q.processAllAvailable()
      source.addData(Ev(100, java.sql.Timestamp.valueOf("2024-02-02 00:00:00"),
        1, "__flush", 0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("wm_probe2")
      .filter(col("event_type") =!= "__flush").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((ts(4), "d", 1L), (ts(5), "a", 1L)))
  }
}
