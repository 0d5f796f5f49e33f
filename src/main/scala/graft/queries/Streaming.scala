package graft.queries

import graft.{QueryDef, Tables}
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming transforms verified in batch mode (SURVEY §2.5): the same
  * plan runs under readStream (StreamingSpec), here the driver checks
  * its batch output against DuckDB.
  */
object Streaming {

  def sTumblingAgg(spark: SparkSession, dir: String): DataFrame =
    Streams.tumblingAgg(Tables.load(spark, dir, "events"))

  val sTumblingAggSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
              count(*) AS n_events, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2"""

  def sSessionize(spark: SparkSession, dir: String): DataFrame =
    Streams.sessionize(Tables.load(spark, dir, "events"), gapSeconds = 1800L)
      .select(col("user_id"), col("session_idx").cast("long").as("session_idx"),
        col("session_start"), col("session_end"), col("n_events"))

  val sSessionizeSql: String =
    """WITH marked AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(epoch(ts)) OVER w IS NULL
                       OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, ts,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         FROM marked)
       SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              min(ts) AS session_start, max(ts) AS session_end,
              count(*) AS n_events
       FROM sess GROUP BY user_id, session_idx"""

  /** Batch face of the streaming dedup (SURVEY §2.5 row 39b): which
    * (user, event_type) keys survive. The key set is deterministic even
    * though dropDuplicates' surviving ROW is not, so this is the
    * oracle-safe projection.
    */
  def sDedupKeys(spark: SparkSession, dir: String): DataFrame =
    Streams.dedupStream(Tables.load(spark, dir, "events"),
        Seq("user_id", "event_type"), withWatermark = false)
      .select(col("user_id"), col("event_type"))

  val sDedupKeysSql: String =
    "SELECT DISTINCT user_id, event_type FROM events"

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("s_tumbling_agg", sTumblingAgg, sTumblingAggSql),
    QueryDef.sql("s_sessionize", sSessionize, sSessionizeSql),
    QueryDef.sql("s_dedup_keys", sDedupKeys, sDedupKeysSql))
}
