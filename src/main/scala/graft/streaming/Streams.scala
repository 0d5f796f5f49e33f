package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming analytics (SURVEY §2.5) — the Structured-Streaming
  * re-expression of the reference's WAL tailing (server/commitlog.go).
  *
  * Each transform is written once and applied to BOTH a batch DataFrame
  * (driver-verifiable against a SQL oracle) and a `readStream` source
  * (asserted in StreamingSpec via MemoryStream): Spark's unified
  * batch/stream semantics make the same plan valid in both modes, with
  * the watermark bounding state at scale.
  */
object Streams {

  /** Tumbling-window aggregate over events: per (hour, event_type)
    * count + value sum. In streaming mode the 1h watermark bounds state;
    * in batch mode it is a no-op.
    */
  def tumblingAgg(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Gap-based sessionization (batch formulation): a session breaks when
    * a user is idle longer than `gapSeconds`. One shuffle on user_id;
    * the two window functions share the same partitioning.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val epoch = col("ts").cast("long")
    val prev = lag(epoch, 1).over(w)
    val isNew = when(prev.isNull || epoch - prev > gapSeconds, 1).otherwise(0)
    events
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
