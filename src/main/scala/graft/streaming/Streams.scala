package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Row shapes for the stateful streaming sessionizer. */
final case class SessionInput(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
final case class SessionState(startMs: Long, endMs: Long, n: Long)
final case class SessionOutput(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

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

  /** Gap-based sessionization, streaming formulation: per-user custom
    * state via `flatMapGroupsWithState` with an event-time timeout. A
    * session closes (and is emitted, Append mode) when the watermark
    * passes its last event + gap; state size is one (start, end, count)
    * triple per open session per user — bounded regardless of stream
    * length. Late events inside the micro-batch are handled by sorting
    * the group iterator; events older than the watermark are dropped by
    * the engine before they reach the function.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapSeconds: Long = 1800L, watermark: String = "1 hour"): Dataset[SessionOutput] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, it: Iterator[SessionInput],
        state: GroupState[SessionState]): Iterator[SessionOutput] = {
      def emit(s: SessionState): SessionOutput =
        SessionOutput(userId, new java.sql.Timestamp(s.startMs),
          new java.sql.Timestamp(s.endMs), s.n)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        val sorted = it.map(e => e.ts.getTime).toArray.sorted
        var cur = state.getOption
        val closed = Seq.newBuilder[SessionOutput]
        sorted.foreach { t =>
          cur match {
            case Some(s) if t - s.endMs <= gapMs =>
              cur = Some(SessionState(s.startMs, math.max(s.endMs, t), s.n + 1))
            case Some(s) =>
              closed += emit(s)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close when the event-time watermark passes last-seen + gap
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"))
      .as[SessionInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
