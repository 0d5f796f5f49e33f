package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Row shapes for the stateful streaming sessionizer. */
final case class SessionInput(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
final case class SessionBuffer(timesMs: Seq[Long])
final case class SessionOutput(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/** Row shape for the bounded-state Bloom dedup stream. */
final case class BloomDedupRow(bucket: Int, khash: Long, event_id: Long,
    ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Row shapes for the streaming ordered funnel. */
final case class FunnelInput(user_id: Long, event_type: String,
    ts: java.sql.Timestamp, event_id: Long)
final case class FunnelState(step: Int, lastTsUs: Long)
final case class FunnelHit(user_id: Long, step: Int, ts: java.sql.Timestamp)

/** Row shapes for the streaming CEP pattern matcher. `CepComp` is one
  * step completion: its own (µs, id) position plus the best (latest)
  * chain HEAD reachable through valid predecessors.
  */
final case class CepComp(tsUs: Long, id: Long, hTsUs: Long, hId: Long, hasH: Boolean)
final case class CepState(levels: Seq[Seq[CepComp]], vTsUs: Long, vId: Long,
    hasV: Boolean, eTsUs: Long, eId: Long, hasE: Boolean)
final case class CepHit(user_id: Long, event_id: Long, matched: Boolean)

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

  private val scratchCreated =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val scratchHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchCreated.forEach { p =>
        try graft.store.Snapshot.deleteRecursively(p)
        catch { case _: Throwable => () }
      }))
  }

  /** Ephemeral scratch dir for the self-contained streaming replay
    * faces (checkpoints + generated micro-batch sources). These faces
    * create a FRESH checkpoint per run and never attempt recovery, so
    * checkpoint durability buys nothing — but the per-micro-batch
    * offset/commit log fsyncs land on this path, and on a shared disk
    * those fsyncs are the dominant jitter in trigger pacing (the
    * bench's per-trigger telemetry shows 0.9–1.4 s of pure machinery
    * between sub-second folds). Prefer the memory-backed /dev/shm when
    * present; fall back to java.io.tmpdir. Dirs are swept on JVM exit.
    * A REAL deployment points checkpointLocation at durable storage —
    * this helper is only for replay faces whose state dies with the
    * process anyway.
    */
  def scratchDir(prefix: String): String = {
    scratchHook
    val base = sys.env.get("GRAFT_SCRATCH").map(java.nio.file.Paths.get(_))
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        Option.when(java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm))(shm)
      }
    val dir = base match {
      case Some(b) => java.nio.file.Files.createTempDirectory(b, prefix)
      case None => java.nio.file.Files.createTempDirectory(prefix)
    }
    scratchCreated.add(dir)
    dir.toString
  }

  /** Scale-adaptive shuffle/state width for a REAL streaming query,
    * derived from the source's on-disk byte size (guide §2/§6: derive
    * partitioning from input size, never a constant tuned for one
    * deployment): one partition per ~64 MB of input (env/prop
    * overridable), clamped to cluster width. A stateful streaming agg
    * otherwise opens `spark.sql.shuffle.partitions` state stores PER
    * TRIGGER — at bench scale that is 32 store open/commit cycles per
    * trigger for kilobytes of state; at real scale `bytes/target`
    * exceeds any cluster width and this is simply defaultParallelism.
    */
  def streamWidth(spark: org.apache.spark.sql.SparkSession,
      sourcePath: String): Int = {
    val para = spark.sparkContext.defaultParallelism
    val target = sys.props.get("graft.streamTargetBytes")
      .orElse(sys.env.get("GRAFT_STREAM_TARGET_BYTES"))
      .map(_.toLong).getOrElse(64L << 20)
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(sourcePath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      } catch { case _: Throwable => Long.MaxValue }
    math.max(1, math.min(para.toLong, bytes / target + 1L).toInt)
  }

  /** Run `body` (start + drain + stop of ONE streaming query) with the
    * session shuffle width pinned to `width`. The micro-batch engine
    * clones the session at `start()`, so the scoped value governs every
    * trigger of the query (including its state-store partition count,
    * which the first batch seals into the checkpoint) while the restore
    * leaves the session untouched for the next face.
    */
  def withStreamWidth[T](spark: org.apache.spark.sql.SparkSession,
      width: Int)(body: => T): T = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions", "200")
    conf.set("spark.sql.shuffle.partitions", width.toString)
    try body finally conf.set("spark.sql.shuffle.partitions", prev)
  }

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

  /** Per-type event-rate anomaly screen: hours whose event count
    * exceeds that type's mean + 3σ across the observed hours — the
    * ops-dashboard "rate spike" detector. The per-type moment table
    * (count of hours, Σc, Σc²) is type-domain-bounded, so it rides as
    * a broadcast join back onto the hourly counts; mean and the
    * variance numerator derive from EXACT integer sums, making the
    * flag decision bit-identical in any engine or partitioning (the
    * one float op is the final sqrt, applied identically on both
    * sides of the comparison). Sample variance (n−1); single-hour
    * types can't flag.
    */
  def rateAnomalies(events: DataFrame, sigmas: Double = 3.0): DataFrame = {
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("window_start"), col("event_type"), col("c"))
    val stats = hourly.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
    val mean = col("s").cast("double") / col("n")
    val sd = sqrt((col("ss") - col("s") * col("s") / col("n").cast("double"))
      / (col("n") - 1))
    hourly.join(broadcast(stats), col("event_type") === col("et"))
      .filter(col("n") > 1 && col("c") > mean + lit(sigmas) * sd)
      .select(col("window_start"), col("event_type"), col("c").as("n_events"),
        round(mean, 4).as("mean_rate"), round(sd, 4).as("sd_rate"))
  }

  /** Seasonality-adjusted event-rate anomalies: the [[rateAnomalies]]
    * detector with the baseline CONDITIONED on hour-of-day — each
    * (type, hour-of-day) cell gets its own exact-integer moments, so a
    * 3 a.m. spike that sits below the daily-peak mean still flags, and
    * the daily peak itself stops flagging (the two failure modes of the
    * global screen). Moment table is domain-bounded (types × 24),
    * broadcast back onto hourly counts; same bit-identical flag
    * arithmetic (one sqrt on identical doubles), sample variance,
    * single-observation cells can't flag.
    */
  def seasonalAnomalies(events: DataFrame, sigmas: Double = 3.0): DataFrame = {
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("window_start"), col("event_type"), col("c"),
        hour(col("w.start")).as("hod"))
    val stats = hourly.groupBy(col("event_type").as("et"), col("hod").as("h"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
    val mean = col("s").cast("double") / col("n")
    val sd = sqrt((col("ss") - col("s") * col("s") / col("n").cast("double"))
      / (col("n") - 1))
    hourly.join(broadcast(stats),
        col("event_type") === col("et") && col("hod") === col("h"))
      .filter(col("n") > 1 && col("c") > mean + lit(sigmas) * sd)
      .select(col("window_start"), col("event_type"), col("hod"),
        col("c").as("n_events"),
        round(mean, 4).as("mean_rate"), round(sd, 4).as("sd_rate"))
  }

  /** One-sided CUSUM change-point detection on hourly event rates
    * (Page 1954): S_t = max(0, S_{t-1} + c_t − k) flags SUSTAINED
    * drifts a point-threshold screen (39j/39t) misses, because small
    * excesses accumulate. The recurrence looks inherently sequential,
    * but it has a prefix-scan identity — S_t = R_t − min(0, min_{j≤t}
    * R_j) where R is the running sum of (c − k) — so it compiles to
    * TWO windows over the per-type hourly series (≤ hours rows per
    * type, time-ordered within the type partition — never a global
    * sort). Reference k = per-type round-half-up mean (exact integer),
    * decision threshold h = 3k; every quantity stays an exact long, so
    * the flag set is bit-identical across engines and partitionings.
    */
  def cusumDrift(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("window_start"), col("event_type"), col("c"))
    // reference = round-half-up mean PLUS a 10%+1 allowance: with k at
    // the bare mean the statistic is a zero-drift random walk and
    // flags noise; the slack makes in-control drift strictly negative
    // (Page's k = μ + δ/2 with δ ≈ 20% of rate)
    val k = hourly.groupBy(col("event_type").as("et"))
      .agg(expr("""(2 * sum(c) + count(1)) DIV (2 * count(1))
                   + 1 + (sum(c) DIV count(1)) DIV 10""").as("k"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(k), col("event_type") === col("et"))
      .withColumn("r", sum(col("c") - col("k")).over(wOrd))
      .withColumn("cusum",
        col("r") - least(lit(0L), min(col("r")).over(wOrd)))
      .withColumn("flagged", col("cusum") > lit(3L) * col("k"))
  }

  /** EWMA control chart (Roberts 1959) — the SMOOTHED member of the
    * ops-screen family (rate/seasonal flag single hours against a
    * static baseline, CUSUM accumulates drift; EWMA tracks a MOVING
    * baseline, so a spike against recent history flags even where the
    * global mean would absorb it): s₁ = c₁, sₜ = α·cₜ + (1−α)·sₜ₋₁
    * at α = 1/4 (exact binary), flag when cₜ > 2·sₜ₋₁.
    *
    * The recurrence is inherently sequential and — unlike CUSUM's
    * max-walk — has no exact prefix-identity compilation (the closed
    * form needs (1−α)^(t−j) weights spanning hundreds of orders of
    * magnitude; a window sum over those is numeric garbage). It also
    * never needs one: the per-type hourly series is DOMAIN-bounded
    * (types × hours), so the fold runs as one `aggregate` HOF over
    * each type's collected, sorted series — deterministic operation
    * order, bit-identical trajectory across engines and
    * partitionings. The shuffle is the hourly pre-aggregation of the
    * event stream; the fold touches only the bounded series (the
    * s_rate_anomaly moment-table discipline, applied to state).
    */
  def ewmaChart(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("window_start"), col("event_type"), col("c"))
    val series = hourly.groupBy(col("event_type"))
      .agg(array_sort(collect_list(
        struct(col("window_start").as("h"), col("c").as("c")))).as("arr"))
    // s-trajectory in one fold; prior-state lookup by position
    series
      .withColumn("sm", expr(
        """aggregate(arr, cast(array() as array<double>),
             (acc, e) -> acc || array(
               CASE WHEN size(acc) = 0 THEN cast(e.c AS double)
                    ELSE 0.25D * e.c + 0.75D * element_at(acc, -1) END))"""))
      .select(col("event_type"), posexplode(col("arr")).as(Seq("pos", "e")),
        col("sm"))
      .select(col("event_type"),
        col("e.h").as("window_start"), col("e.c").as("c"),
        round(element_at(col("sm"), col("pos") + 1), 6).as("ewma"),
        when(col("pos") > 0,
          col("e.c") > lit(2.0) * element_at(col("sm"), col("pos")))
          .otherwise(lit(false)).as("flagged"))
  }

  /** The CUSUM detector's per-type report card: reference rate, the
    * maximum drift statistic the series ever accumulated, how many
    * hours crossed the 3k decision threshold, and when the first
    * crossing happened (null = the series stayed in control — itself
    * the informative answer on a stationary stream; StreamingSpec's
    * planted slow ramp proves the detector fires when drift is real).
    */
  def cusumReport(events: DataFrame): DataFrame =
    cusumDrift(events)
      .groupBy(col("event_type"))
      .agg(first(col("k")).as("ref_rate"),
        max(col("cusum")).as("max_cusum"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_hours_flagged"),
        min(when(col("flagged"), col("window_start"))).as("first_flag"))

  /** Per-window Misra-Gries heavy hitters: the frequency sketch
    * ([[graft.operators.FreqSketch]]) keyed by tumbling window — "what
    * dominated each hour" with k-bounded state per window, the form the
    * sketch takes on an unbounded stream (global MG state would grow
    * with stream lifetime; windowed state expires with the watermark).
    * Same partial-merge Aggregator, so each micro-batch folds in
    * map-side; FreqSketchSpec drives the identical plan through
    * readStream in append mode past the watermark.
    */
  def windowedHeavyHitters(events: DataFrame, itemCol: String, capacity: Int,
      withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    val f = udaf(new graft.operators.FreqSketch.MisraGriesAggregator(capacity),
      org.apache.spark.sql.Encoders.STRING)
    src.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(f(col(itemCol)).as("hh"))
      .select(col("w.start").as("window_start"), explode(col("hh")).as("e"))
      .select(col("window_start"), col("e._1").as("item"),
        col("e._2").as("est_count"))
  }

  /** Per-window approximate distinct keys via the KMV sketch
    * ([[graft.operators.Kmv]]): "how many distinct users each hour" with
    * k-bounded state per window — the same windowed-sketch contract as
    * [[windowedHeavyHitters]] (global sketch state would outlive the
    * stream; windowed state expires with the watermark). KMV partials
    * merge associatively and order-independently, so the streaming
    * incremental aggregation yields BIT-IDENTICAL sketches to the batch
    * plan (StreamingSpec asserts equality, not tolerance); below k
    * distinct keys the estimate IS the exact count.
    */
  def windowedDistinctKmv(events: DataFrame, keyCol: String, k: Int,
      withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.select(col("ts"),
        xxhash64(col(keyCol)).bitwiseXOR(lit(Long.MinValue)).as("__f"))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.operators.Kmv.kmvAgg(k)(col("__f")).as("sketch"))
      .select(col("w.start").as("window_start"),
        round(graft.operators.Kmv.estimateDistinct(col("sketch"), k), 2)
          .as("est_distinct"))
  }

  /** Per-window latency-style quantiles via the HDR sketch aggregate
    * ([[graft.operators.HdrSketch.HdrQuantileAggregator]]) — "p50/p90/
    * p99 per hour" with ONE agg (streaming-legal), ≤ ~1000-entry
    * bucket-map state per window expiring with the watermark, and
    * map-side partials that merge by exact integer addition — so the
    * stream answer is BIT-IDENTICAL to batch whatever the micro-batch
    * boundaries, and the batch face hash-matches a SQL bucket mirror
    * (the property no GK/KLL/t-digest window could offer).
    */
  def windowedQuantiles(events: DataFrame, valueCol: Column,
      withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    val agg = graft.operators.HdrSketch.quantileAgg(
      Seq((1, 2), (9, 10), (99, 100)))
    src.select(col("ts"), valueCol.as("__v"))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(agg(col("__v")).as("q"))
      .select(col("w.start").as("window_start"),
        element_at(col("q"), 1).as("n_events"),
        element_at(col("q"), 2).as("p50"),
        element_at(col("q"), 3).as("p90"),
        element_at(col("q"), 4).as("p99"))
  }

  /** Per-window top-k records by value via the k-bounded TopK partial
    * aggregate ([[graft.operators.TopK]]) — the windowed/streaming face
    * of §2.4 row 36b: "the k largest transactions each hour" without a
    * per-window sort. The exchange carries at most k entries per
    * (window, map partition) and state per window is the k-slot buffer,
    * expiring with the watermark; a window-rank formulation would hold
    * every event of the hour in state. Deterministic (value desc,
    * id asc) order makes the result hash-match the row_number oracle.
    */
  def windowedTopK(events: DataFrame, valueCol: String, idCol: String,
      k: Int, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    val f = graft.operators.TopK.topK(k)
    src.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(f(col(valueCol), col(idCol)).as("top"))
      .select(col("w.start").as("window_start"),
        posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("window_start"), (col("pos") + 1).cast("long").as("rank"),
        col("e._2").as(idCol), col("e._1").as(valueCol))
  }

  /** Sliding-window aggregate: 1-hour windows every 30 minutes, so each
    * event contributes to windowLen/slide = 2 windows. Spark expands the
    * window set in a narrow projection (no per-window shuffle); the
    * watermark bounds state in streaming mode exactly as for tumbling
    * windows. Windows align to the epoch (Spark's default startTime 0),
    * which the oracle mirrors via 30-minute `time_bucket`s.
    */
  def slidingAgg(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Stream-stream interval join: clicks joined to same-user purchases
    * whose attribution window [purchase - windowSeconds, purchase]
    * contains the click. In streaming mode BOTH sides carry a watermark
    * and the join condition is equality + a bounded time interval —
    * exactly the shape Structured Streaming needs to age out join state
    * (a click older than watermark + window can never match a future
    * purchase). In batch mode the same plan is a hash join on user_id
    * with the range as residual predicate; the scale formulation for
    * the KEYLESS case is [[graft.operators.RangeJoin]], and the two
    * must (and do) agree on the oracle.
    */
  def intervalJoin(events: DataFrame, windowSeconds: Long = 1800L,
      withWatermark: Boolean = false, watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val clicks0 = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val purchases0 = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val clicks = if (withWatermark) clicks0.withWatermark("c_ts", watermark) else clicks0
    val purchases =
      if (withWatermark) purchases0.withWatermark("p_ts", watermark) else purchases0
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
          col("c_ts") <= col("p_ts"),
        joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** LEFT OUTER face of [[intervalJoin]]: every click, with its
    * attributed purchase or NULL. The semantics Structured Streaming
    * makes subtle: a null-padded row for an unmatched click can only be
    * emitted once the watermark proves no future purchase can still
    * match (click older than watermark − window), so unmatched rows
    * arrive LATE by design — state-eviction time, not arrival time.
    * StreamingSpec pins exactly that: no null row while the match
    * window is open, the null row after the watermark passes it. In
    * batch mode the same plan is a plain left join; the matched subset
    * is bit-identical to the inner face.
    */
  def intervalJoinOuter(events: DataFrame, windowSeconds: Long = 1800L,
      withWatermark: Boolean = false, watermark: String = "1 hour"): DataFrame =
    intervalJoin(events, windowSeconds, withWatermark, watermark, "left_outer")

  /** Stream-static enrichment: the event stream joined to a (small,
    * slowly-changing) dimension table and aggregated per (hour window,
    * dimension attribute). The dimension side is `broadcast` — in
    * streaming mode Structured Streaming re-evaluates the static side
    * per micro-batch against broadcast state, never shuffling the
    * stream; in batch mode the same plan is a plain broadcast-hash
    * join. This is THE bread-and-butter streaming-ETL shape (facts
    * stream, dimensions don't), distinct from the stream-stream
    * interval join above (both sides watermarked there).
    */
  def enrichAgg(events: DataFrame, dim: DataFrame, dimKey: String,
      dimAttr: String, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.join(broadcast(dim), src("user_id") === dim(dimKey))
      .groupBy(window(col("ts"), "1 hour").as("w"), col(dimAttr))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col(dimAttr),
        col("n_events"), col("sum_value"))
  }

  /** Gap-based sessionization (batch formulation): a session breaks when
    * a user is idle longer than `gapSeconds`. One shuffle on user_id;
    * the two window functions share the same partitioning.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // fractional-second epoch: cast to long truncates sub-second parts,
    // which can flip a gap comparison within 1s of the threshold vs the
    // oracle's fractional epoch(ts)
    val epoch = col("ts").cast("double")
    val prev = lag(epoch, 1).over(w)
    val isNew = when(prev.isNull || epoch - prev > gapSeconds, 1).otherwise(0)
    events
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Gap-based sessionization via the engine-native `session_window`
    * aggregation — the third face of the same semantics (batch windows,
    * custom fMGWS state, native session windows): each event opens a
    * [ts, ts+gap) window and overlapping windows merge inside ONE
    * stateful aggregation; in streaming mode sessions emit in Append
    * once the watermark passes the merged window's end. State is
    * per-open-session, watermark-bounded — the engine-managed version
    * of what [[sessionizeStream]] maintains by hand. Boundary
    * convention: an exact-gap arrival SPLITS here (merge requires
    * next < prev + gap) but CONTINUES in [[sessionize]] (split requires
    * diff > gap) — equal everywhere except diff == gap exactly.
    */
  def sessionizeNative(events: DataFrame, gapSeconds: Long = 1800L,
      withWatermark: Boolean = true, watermark: String = "1 hour"): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", watermark) else events
    src.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
  }

  /** Streaming exact dedup: keep the first event per key, with state
    * bounded by the event-time watermark — Structured Streaming's native
    * `dropDuplicatesWithinWatermark` (late duplicates beyond the horizon
    * are the pipeline's dedup-window tradeoff, exactly as in a batch
    * dedup over a rolling corpus slice). In batch mode (no watermark)
    * this degrades to a plain `dropDuplicates` on the key.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      withWatermark: Boolean = true, watermark: String = "1 hour"): DataFrame =
    if (withWatermark)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Approximate streaming dedup with BOUNDED state — the 100 TB
    * complement to [[dedupStream]]: exact dedup state grows with key
    * cardinality inside the watermark (every first-seen key is
    * remembered), which on an unbounded key space is itself unbounded.
    * Here state is a fixed-size Bloom filter per hash bucket
    * (`buckets × optimalNumBits(expectedPerBucket, fpp) / 8` bytes
    * TOTAL, for the stream's whole lifetime), grouped by
    * `xxhash64(key) mod buckets` so the filters shard evenly and
    * micro-batch work parallelizes across buckets.
    *
    * Semantics: duplicates are ALWAYS suppressed (Bloom filters have no
    * false negatives); an fpp-fraction of genuine first arrivals is
    * wrongly suppressed too — the right trade for dedup (a lost unique
    * costs one document; a leaked duplicate costs training-data
    * quality), and the same one every at-scale streaming deduper makes.
    * No timeout: state size is constant, so there is nothing for a
    * watermark to bound.
    *
    * Two approximation sources, both documented trades: the Bloom fpp
    * above, AND the fact that dedup keys are the 64-bit `xxhash64` of
    * the key expression — two distinct keys colliding on the 64-bit
    * hash are conflated (birthday bound ≈ n²/2⁶⁵, ~0.03 expected extra
    * losses per billion uniques — negligible next to fpp, but nonzero).
    * The row schema is pinned to the events table (event_id/ts/user_id/
    * event_type/value); generalizing to arbitrary input rows means
    * struct-packing the payload through [[BloomDedupRow]].
    */
  /** Streaming ordered funnel — the stream face of
    * [[graft.operators.Funnel]]: per user, advance a step cursor when
    * the NEXT needed step type arrives strictly after the previous
    * step's time, emitting one (user, step, ts) row per completion.
    *
    * Per-user state is a step index + one timestamp — CONSTANT bytes
    * per user regardless of event volume (never a buffered event
    * array; the one-bot-user-with-10M-events case costs the same 12
    * bytes as anyone else). For per-user-IN-ORDER delivery the greedy
    * cursor computes exactly the batch funnel's earliest-completion
    * recursion (t1 = first step-1 event; t_{i+1} = first step-(i+1)
    * event strictly after t_i): processing in time order makes "first
    * seen that qualifies" ≡ "minimum that qualifies". Each micro-batch
    * is sorted by (ts, event_id) before folding, so the guarantee
    * needed from the transport is per-user in-order BATCHES, not
    * in-order rows. StreamingSpec drives multi-batch streams against
    * the batch operator; completed steps are final (append mode), so
    * no retraction is ever needed.
    */
  def funnelStream(events: DataFrame, steps: Seq[String]): Dataset[FunnelHit] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val src = events.select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts"), col("event_id").cast("long").as("event_id"))
      .as[FunnelInput]

    def update(userId: Long, it: Iterator[FunnelInput],
        state: GroupState[FunnelState]): Iterator[FunnelHit] = {
      var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
      val out = Seq.newBuilder[FunnelHit]
      it.toSeq.sortBy(e => (e.ts.getTime * 1000 + e.ts.getNanos / 1000 % 1000,
          e.event_id))
        .foreach { e =>
          if (st.step < steps.length && e.event_type == steps(st.step)) {
            val tUs = e.ts.getTime * 1000 + e.ts.getNanos / 1000 % 1000
            if (st.step == 0 || tUs > st.lastTsUs) {
              st = FunnelState(st.step + 1, tUs)
              out += FunnelHit(userId, st.step, e.ts)
            }
          }
        }
      state.update(st)
      out.result().iterator
    }

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming complex-event-processing: classify every occurrence of
    * the FINAL step type by whether a full `steps` chain completes it —
    * strictly ordered occurrences of each step type, consecutive steps
    * within `windowSec` of each other, and NO `guard` event strictly
    * between the chain's HEAD (first step) and its final event. The
    * negative condition is what separates CEP from the funnel: the
    * funnel only advances on wanted types; a pattern with an absence
    * guard must WATCH the unwanted type. Emits one (user, final
    * event_id, matched) row per final-step event.
    *
    * Exact under EXISTS semantics (a final event matches iff ANY valid
    * chain completes it), with no chain enumeration: for each step-i
    * completion the state keeps only the MAX chain head reachable
    * through valid predecessors — heads(e_i) is the union over
    * in-window predecessors p of heads(p), so max-of-union is the
    * per-predecessor max, level by level; and a chain survives the
    * absence guard iff its head ≥ the latest guard event before the
    * final (all comparisons on the (µs, event_id) total order, mirrored
    * exactly by the oracle), so "some chain survives" ≡ "the max head
    * survives". Per-user state is one completion list per INTERMEDIATE
    * step, each pruned to the last `windowSec` — the standard CEP state
    * bound (the one-hot-user pathology costs its window, never its
    * history).
    *
    * Like [[funnelStream]], each micro-batch sorts its group by
    * (ts, event_id) before folding, so the transport guarantee needed
    * is per-user in-order BATCHES (StreamingSpec drives time-split
    * multi-batch streams against the batch-SQL truth).
    */
  def cepStream(events: DataFrame, steps: Seq[String], guard: String,
      windowSec: Long): Dataset[CepHit] = {
    require(steps.size >= 2, "CEP pattern needs at least two steps")
    require(steps.distinct.size == steps.size && !steps.contains(guard),
      "CEP step types must be distinct and disjoint from the guard type")
    val spark = events.sparkSession
    import spark.implicits._
    val wUs = windowSec * 1000000L
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    val src = events.select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts"), col("event_id").cast("long").as("event_id"))
      .as[FunnelInput]

    def le(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
      aTs < bTs || (aTs == bTs && aId <= bId)

    def update(userId: Long, it: Iterator[FunnelInput],
        state: GroupState[CepState]): Iterator[CepHit] = {
      // levels(i) holds completions of step i for 1 <= i <= k-2
      var st = state.getOption.getOrElse(
        CepState(Seq.fill(math.max(k - 2, 0))(Nil), 0L, 0L, hasV = false,
          0L, 0L, hasE = false))
      val out = Seq.newBuilder[CepHit]

      def preds(i: Int, tUs: Long): Option[CepComp] =
        if (i == 1) {
          if (st.hasV && tUs - st.vTsUs <= wUs)
            Some(CepComp(st.vTsUs, st.vId, st.vTsUs, st.vId, hasH = true))
          else None
        } else {
          val valid = st.levels(i - 2).filter(c =>
            c.hasH && tUs - c.tsUs <= wUs)
          if (valid.isEmpty) None
          else Some(valid.maxBy(c => (c.hTsUs, c.hId)))
        }

      it.toSeq.sortBy(e => (e.ts.getTime * 1000 + e.ts.getNanos / 1000 % 1000,
          e.event_id))
        .foreach { e =>
          val tUs = e.ts.getTime * 1000 + e.ts.getNanos / 1000 % 1000
          if (e.event_type == guard)
            st = st.copy(eTsUs = tUs, eId = e.event_id, hasE = true)
          else stepIdx.get(e.event_type) match {
            case Some(0) =>
              st = st.copy(vTsUs = tUs, vId = e.event_id, hasV = true)
            case Some(i) if i < k - 1 =>
              val best = preds(i, tUs)
              val comp = CepComp(tUs, e.event_id,
                best.map(_.hTsUs).getOrElse(0L), best.map(_.hId).getOrElse(0L),
                best.isDefined)
              st = st.copy(levels = st.levels.updated(i - 1,
                (st.levels(i - 1) :+ comp).filter(_.tsUs >= tUs - wUs)))
            case Some(i) if i == k - 1 =>
              val best = preds(i, tUs)
              val matched = best.exists(b =>
                !st.hasE || le(st.eTsUs, st.eId, b.hTsUs, b.hId))
              out += CepHit(userId, e.event_id, matched)
              st = st.copy(levels = st.levels.map(_.filter(_.tsUs >= tUs - wUs)))
            case _ => ()
          }
        }
      state.update(st)
      out.result().iterator
    }

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Watermarked tumbling-window aggregation with REAL late-data drops —
    * the operator s_late_data gate-checks. Unlike [[tumblingAgg]] (whose
    * gate face sees in-order data and drops nothing), this one is driven
    * with time-interleaved batches so the watermark actually discards
    * rows, and the face's oracle replays the drop rule in SQL
    * (WatermarkProbeSpec pins the semantics: a row drops iff its window
    * end ≤ the late-event watermark in force during its batch —
    * SPARK-42376's previous-batch value — inclusive boundary).
    *
    * Deliberately NO pre-agg filter on the flush sentinels: Catalyst
    * pushes filters below the EventTimeWatermark node, and filtered
    * sentinels would never advance the watermark (measured: the whole
    * output stayed withheld). Sentinels flow into the aggregation and
    * the CALLER filters them from the sink table.
    */
  def lateDataAgg(events: DataFrame, delay: String = "1 hour",
      windowLen: String = "1 day"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  def bloomDedupStream(events: DataFrame, key: org.apache.spark.sql.Column,
      buckets: Int = 64, expectedPerBucket: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(
        pmod(xxhash64(key), lit(buckets.toLong)).cast("int").as("bucket"),
        xxhash64(key).as("khash"),
        col("event_id").cast("long").as("event_id"), col("ts"),
        col("user_id").cast("long").as("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[BloomDedupRow]

    def update(bucket: Int, it: Iterator[BloomDedupRow],
        state: GroupState[Array[Byte]]): Iterator[BloomDedupRow] = {
      import org.apache.spark.util.sketch.BloomFilter
      val bf = state.getOption
        .map(b => BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
        .getOrElse(BloomFilter.create(expectedPerBucket, fpp))
      // materialize survivors BEFORE serializing state: the filter is
      // lazy and state.update must see every putLong of this batch
      val fresh = it.filter { e =>
        if (bf.mightContainLong(e.khash)) false
        else { bf.putLong(e.khash); true }
      }.toVector
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      state.update(bos.toByteArray)
      fresh.iterator
    }

    keyed.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
  }

  /** Gap-based sessionization, streaming formulation: per-user custom
    * state via `flatMapGroupsWithState` with an event-time timeout.
    *
    * Events buffer in state and NOTHING is emitted until the event-time
    * timeout fires: sessions are only finalized once the watermark has
    * passed `max(ts) + gap`, at which point no event that could extend,
    * bridge, or precede them can still arrive (anything later the
    * engine admits has `ts ≥ watermark > max(ts) + gap`, i.e. a new
    * session by definition). Emitting eagerly inside a batch would be
    * wrong in Append mode: a within-watermark out-of-order event in a
    * later batch can bridge two apparent sessions or extend a "closed"
    * one backwards. State per user is the event-time buffer inside the
    * watermark horizon — bounded by the watermark, not stream length.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapSeconds: Long = 1800L, watermark: String = "1 hour"): Dataset[SessionOutput] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, it: Iterator[SessionInput],
        state: GroupState[SessionBuffer]): Iterator[SessionOutput] = {
      if (state.hasTimedOut) {
        // watermark > max(ts) + gap: every buffered event is final —
        // sort, split on the gap, emit all sessions
        val ts = state.getOption.map(_.timesMs).getOrElse(Nil).sorted
        state.remove()
        val out = Seq.newBuilder[SessionOutput]
        var start = -1L
        var end = -1L
        var n = 0L
        ts.foreach { t =>
          if (n == 0L || t - end > gapMs) {
            if (n > 0L) out += SessionOutput(userId,
              new java.sql.Timestamp(start), new java.sql.Timestamp(end), n)
            start = t; end = t; n = 1L
          } else { end = t; n += 1L }
        }
        if (n > 0L) out += SessionOutput(userId,
          new java.sql.Timestamp(start), new java.sql.Timestamp(end), n)
        out.result().iterator
      } else {
        val merged = state.getOption.map(_.timesMs).getOrElse(Nil) ++
          it.map(_.ts.getTime)
        state.update(SessionBuffer(merged))
        state.setTimeoutTimestamp(merged.max + gapMs)
        Iterator.empty
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
