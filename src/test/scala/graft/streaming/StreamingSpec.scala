package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Structured-Streaming equivalence: the same Streams transforms run
  * under readStream (MemoryStream source, memory sink) and must produce
  * the batch answer once the stream is drained.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val events = Seq(
    Ev(1, ts(0), 1, "click", 1.0),
    Ev(2, ts(5), 1, "click", 2.0),
    Ev(3, ts(20), 2, "view", 3.0),
    Ev(4, ts(59), 1, "click", 4.0),
    // next hour
    Ev(5, java.sql.Timestamp.valueOf("2024-01-01 11:10:00"), 2, "view", 5.0))

  test("tumbling agg over a stream matches the batch plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    source.addData(events: _*)
    val agg = Streams.tumblingAgg(source.toDF(), withWatermark = true)
    val q = agg.writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = Streams.tumblingAgg(events.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.map(_._3).sum === 5L)
  }

  test("windowed KMV distinct over a stream equals the batch sketch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    // two micro-batches so the sketch actually merges across batches
    source.addData(events.take(2): _*)
    source.addData(events.drop(2): _*)
    val agg = Streams.windowedDistinctKmv(source.toDF(), "user_id", k = 256,
      withWatermark = true)
    val q = agg.writeStream
      .format("memory").queryName("kmv_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("kmv_out").orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
    val batch = Streams.windowedDistinctKmv(events.toDF(), "user_id", k = 256)
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
    // KMV partials merge associatively: streaming must be IDENTICAL,
    // and below k the estimate is the exact distinct count
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.map(_._2).toSeq === Seq(2.0, 1.0)) // users {1,2} then {2}
  }

  test("windowed HDR quantiles over a stream equal the batch sketch bit-identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    // three micro-batches so bucket-map partials merge across batches
    source.addData(events.take(2): _*)
    source.addData(events.slice(2, 4): _*)
    source.addData(events.drop(4): _*)
    def cents = round(col("value") * 100, 0).cast("long")
    val agg = Streams.windowedQuantiles(source.toDF(), cents,
      withWatermark = true)
    val q = agg.writeStream
      .format("memory").queryName("hdrq_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("window_start").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val streamed = rows(spark.table("hdrq_out"))
    val batch = rows(Streams.windowedQuantiles(events.toDF(), cents))
    assert(streamed === batch)
    // hour 10 values (cents): 100,200,300,400 → ceil-rank p50 = 200,
    // p90/p99 = 400; all < 3200 so the sketch is in its exact regime
    assert(batch.head._2 === 4L)
    assert((batch.head._3, batch.head._4, batch.head._5) === ((200L, 400L, 400L)))
  }

  test("windowed top-k over a stream matches the batch plan and evicts correctly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    // two micro-batches: after batch one the first hour's k=2 buffer
    // holds events 3 (3.0) and 2 (2.0); batch two's event 4 (4.0) must
    // evict event 2 from streaming state
    source.addData(events.take(3): _*)
    source.addData(events.drop(3): _*)
    val agg = Streams.windowedTopK(source.toDF(), "value", "event_id", k = 2,
      withWatermark = true)
    val q = agg.writeStream
      .format("memory").queryName("topk_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("topk_out").orderBy("window_start", "rank")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = Streams.windowedTopK(events.toDF(), "value", "event_id", k = 2)
      .orderBy("window_start", "rank")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === batch.toSeq)
    // hour 10: top-2 by value desc = events 4 (4.0) and 3 (3.0);
    // events 1 and 2 evicted from the k=2 buffer
    assert(batch.map(r => (r._3, r._4)).toSeq ===
      Seq((4L, 4.0), (3L, 3.0), (5L, 5.0)))
  }

  test("stream-static enrichment joins the broadcast dimension per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "ALPHA"), (2L, "BETA")).toDF("c_custkey", "n_name")
    val source = MemoryStream[Ev]
    source.addData(events.take(3): _*)
    val agg = Streams.enrichAgg(source.toDF(), dim, "c_custkey", "n_name",
      withWatermark = true)
    val q = agg.writeStream
      .format("memory").queryName("enrich_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      source.addData(events.drop(3): _*) // a second micro-batch re-reads the dim
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("enrich_out")
      .orderBy("window_start", "n_name")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = Streams.enrichAgg(events.toDF(), dim, "c_custkey", "n_name")
      .orderBy("window_start", "n_name")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === batch.toSeq)
    // every event's user exists in the dim, so nothing is dropped
    assert(batch.map(_._3).sum === events.size.toLong)
  }

  test("sliding agg over a stream matches the batch plan and double-counts correctly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    source.addData(events: _*)
    val agg = Streams.slidingAgg(source.toDF(), withWatermark = true)
    val q = agg.writeStream
      .format("memory").queryName("sliding_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sliding_out")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = Streams.slidingAgg(events.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === batch.toSeq)
    // every event lands in exactly len/slide = 2 windows
    assert(batch.map(_._3).sum === 2L * events.size)
    // the 10:59 click is in the [10:00,11:00) and [10:30,11:30) windows
    val hits = batch.filter(_._2 == "click").map(r => r._1.toString -> r._3).toMap
    assert(hits("2024-01-01 10:00:00.0") === 3L)
    assert(hits("2024-01-01 10:30:00.0") === 1L)
  }

  test("stream-stream interval join attributes clicks within the purchase window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val joined = Streams.intervalJoin(source.toDF(), windowSeconds = 1800L,
      withWatermark = true, watermark = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("sjoin_out").outputMode("append").start()
    try {
      source.addData(
        Ev(1, ts(0), 1, "click", 1.0),     // 40 min before purchase: outside
        Ev(2, ts(25), 1, "click", 1.0),    // 15 min before: attributed
        Ev(3, ts(30), 2, "click", 1.0),    // other user: not attributed
        Ev(4, ts(40), 1, "purchase", 9.0),
        Ev(5, ts(45), 1, "click", 1.0))    // after the purchase: outside
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sjoin_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 4L)))
    // batch face agrees
    val batch = Streams.intervalJoin(Seq(
        Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(25), 1, "click", 1.0),
        Ev(3, ts(30), 2, "click", 1.0), Ev(4, ts(40), 1, "purchase", 9.0),
        Ev(5, ts(45), 1, "click", 1.0)).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch === got)
  }

  test("rateAnomalies flags exactly the planted spike hour with exact moments") {
    import spark.implicits._
    // type "x": 15 hours of 2 events + 1 hour of 50 → mean 5, sd 12
    // (sample), threshold 41 < 50 → exactly one flag; type "y" flat
    var id = 0L
    val evs = (0 until 16).flatMap { h =>
      val n = if (h == 7) 50 else 2
      (0 until n).map { i =>
        id += 1
        Ev(id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:${i % 60}%02d:00"),
          1, "x", 0.0)
      }
    } ++ (0 until 6).map { h =>
      id += 1
      Ev(id, java.sql.Timestamp.valueOf(f"2024-01-02 $h%02d:00:00"), 2, "y", 0.0)
    }
    val got = Streams.rateAnomalies(evs.toDF()).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getTimestamp(0) === java.sql.Timestamp.valueOf("2024-01-01 07:00:00"))
    assert(r.getString(1) === "x")
    assert(r.getLong(2) === 50L)
    assert(r.getDouble(3) === 5.0)
    assert(r.getDouble(4) === 12.0)
  }

  test("cusumDrift's two-window form equals the sequential max(0,·) recurrence") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // randomized hourly series per type, including a planted slow ramp
    val rows = (for {
      (tpe, drift) <- Seq(("click", 0), ("view", 1)) // view ramps slowly
      h <- 0 until 120
    } yield {
      val c = 5 + rnd.nextInt(4) + (if (h > 60) drift * 5 else 0)
      (tpe, h, c)
    })
    val evs = rows.flatMap { case (tpe, h, c) =>
      Seq.fill(c)(Ev(1, java.sql.Timestamp.valueOf(
        f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:30:00"), 1, tpe, 1.0))
    }
    val got = Streams.cusumDrift(evs.toDF()).filter(col("flagged"))
      .select(col("event_type"), col("window_start"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    // driver reference: the literal sequential recurrence
    val want = rows.groupBy(_._1).toSeq.flatMap { case (tpe, rs) =>
      val ordered = rs.sortBy(_._2)
      val n = ordered.size
      val s = ordered.map(_._3.toLong).sum
      val k = (2 * s + n) / (2 * n) + 1 + (s / n) / 10
      var st = 0L
      ordered.flatMap { case (_, h, c) =>
        st = math.max(0L, st + c - k)
        if (st > 3 * k) Some((tpe, java.sql.Timestamp.valueOf(
          f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00"))) else None
      }
    }.toSet
    assert(got === want)
    assert(want.exists(_._1 == "view") && !want.exists(_._1 == "click"),
      "the planted slow ramp should flag and the flat series should not")
  }

  test("ewmaChart's bounded fold equals the literal sequential recurrence; spikes flag, first hour never does") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    // flat series with one planted 4x spike per type at hour 80
    val rows = (for {
      tpe <- Seq("click", "view")
      h <- 0 until 120
    } yield (tpe, h, 5 + rnd.nextInt(4) + (if (h == 80) 20 else 0)))
    val evs = rows.flatMap { case (tpe, h, c) =>
      Seq.fill(c)(Ev(1, java.sql.Timestamp.valueOf(
        f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:30:00"), 1, tpe, 1.0))
    }
    val got = Streams.ewmaChart(evs.toDF())
      .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // driver reference: the literal recurrence, identical op order
    val want = rows.groupBy(_._1).toSeq.flatMap { case (tpe, rs) =>
      var s = 0.0
      rs.sortBy(_._2).zipWithIndex.map { case ((_, h, c), i) =>
        val sp = s
        s = if (i == 0) c.toDouble else 0.25 * c + 0.75 * s
        val ts = java.sql.Timestamp.valueOf(
          f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00")
        (tpe, ts) -> (c.toLong,
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          i > 0 && c > 2.0 * sp)
      }
    }.toMap
    assert(got === want)
    val flagged = got.filter(_._2._3).keys.toSeq
    assert(flagged.size === 2 && flagged.forall(_._2.getHours == 8),
      s"exactly the two planted hour-80 spikes should flag: $flagged")
  }

  test("left-outer stream-stream join emits null rows only after watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val joined = Streams.intervalJoinOuter(source.toDF(), windowSeconds = 1800L,
      withWatermark = true, watermark = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("sjoin_outer_out").outputMode("append").start()
    def rows() = spark.table("sjoin_outer_out").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    try {
      source.addData(
        Ev(1, ts(0), 1, "click", 1.0),   // 40 min before purchase: no match
        Ev(2, ts(25), 1, "click", 1.0),  // attributed
        Ev(4, ts(40), 1, "purchase", 9.0))
      q.processAllAvailable()
      // matched row emits immediately; the unmatched click CANNOT —
      // its 30-min match window is still inside the watermark
      assert(rows() === Set((1L, 2L, 4L)))
      // the join watermark is the MIN across both branches, so the
      // advancing events must flow on BOTH the click and the purchase
      // side (on an unrelated user so nothing new matches)
      source.addData(
        Ev(90, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 9, "click", 0.0),
        Ev(80, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 8, "purchase", 0.0))
      q.processAllAvailable()
      source.addData(
        Ev(91, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 9, "click", 0.0),
        Ev(81, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 8, "purchase", 0.0))
      q.processAllAvailable()
      source.addData(
        Ev(82, java.sql.Timestamp.valueOf("2024-01-01 13:20:00"), 8, "purchase", 0.0),
        Ev(92, java.sql.Timestamp.valueOf("2024-01-01 13:20:00"), 7, "click", 0.0))
      q.processAllAvailable()
      // watermark (12:50) is now past click@10:00's window → null row
      // out; click@13:00's own window is still open → still held back
      assert(rows().contains((1L, 1L, -1L)))
      assert(!rows().exists(t => t._2 == 91L))
    } finally q.stop()
    // batch face: plain left join, matched subset ≡ the inner face
    val evs = Seq(
      Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(25), 1, "click", 1.0),
      Ev(4, ts(40), 1, "purchase", 9.0))
    val batch = Streams.intervalJoinOuter(evs.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(batch === Set((1L, 1L, -1L), (1L, 2L, 4L)))
    val inner = Streams.intervalJoin(evs.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.filter(_._3 != -1L) === inner)
  }

  test("streaming funnel matches the batch earliest-completion recursion") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    // user 1 completes all three (with a decoy purchase BEFORE its
    // click); user 2 stalls at view (its purchase precedes any click);
    // user 3's click arrives before any view → never starts; user 4's
    // click ties the view timestamp → strictness blocks step 2
    val evs = Seq(
      Ev(1, ts(0), 1, "view", 0.0), Ev(2, ts(1), 1, "purchase", 0.0),
      Ev(3, ts(2), 1, "click", 0.0), Ev(4, ts(9), 1, "purchase", 0.0),
      Ev(5, ts(3), 2, "purchase", 0.0), Ev(6, ts(4), 2, "view", 0.0),
      Ev(7, ts(5), 3, "click", 0.0),
      Ev(8, ts(6), 4, "view", 0.0), Ev(9, ts(6), 4, "click", 0.0))
    val source = MemoryStream[Ev]
    val hits = Streams.funnelStream(source.toDF(), steps)
    val q = hits.writeStream
      .format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      // split across micro-batches at a per-user in-order boundary
      source.addData(evs.filter(_.ts.before(ts(5))): _*)
      q.processAllAvailable()
      source.addData(evs.filterNot(_.ts.before(ts(5))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_out")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    assert(got === Set(
      (1L, 1, ts(0)), (1L, 2, ts(2)), (1L, 3, ts(9)),
      (2L, 1, ts(4)),
      (4L, 1, ts(6))))
    // batch parity: per-step survivor counts from the batch operator
    val frames = graft.operators.Funnel.stepTimes(
      evs.toDF(), "user_id", "event_type", "ts", steps)
    assert(frames.map(_.count()) === Seq(3L, 1L, 1L))
    val streamed = spark.table("funnel_out")
    steps.indices.foreach { i =>
      val streamUsers = streamed.filter(col("step") === i + 1)
        .select("user_id").collect().map(_.getLong(0)).toSet
      val batchUsers = frames(i).select("user").collect().map(_.getLong(0)).toSet
      assert(streamUsers === batchUsers, s"step ${i + 1}")
    }
  }

  test("stateful streaming sessionize closes sessions past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = Streams.sessionizeStream(spark, source.toDF(), gapSeconds = 1800,
      watermark = "10 minutes")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      source.addData(events: _*)
      q.processAllAvailable()
      // push the watermark far past every session's end + gap
      source.addData(Ev(99, java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      source.addData(Ev(100, java.sql.Timestamp.valueOf("2024-01-03 12:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sessions_out")
      .filter(col("user_id") < 9)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    // mirror the batch answer: user 1 → (10:00-10:05, 2 ev), (10:59, 1 ev);
    // user 2 → (10:20, 1 ev), (11:10, 1 ev)
    assert(got.toSeq === Seq(
      (1L, ts(0), ts(5), 2L),
      (1L, ts(59), ts(59), 1L),
      (2L, ts(20), ts(20), 1L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:10:00"),
        java.sql.Timestamp.valueOf("2024-01-01 11:10:00"), 1L)))
  }

  test("streaming sessionize handles within-watermark out-of-order bridging events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = Streams.sessionizeStream(spark, source.toDF(), gapSeconds = 1800,
      watermark = "2 hours")
    val q = sessions.writeStream
      .format("memory").queryName("bridge_out").outputMode("append").start()
    try {
      // 10:00 and 10:40 look like two sessions (40min > 30min gap) ...
      source.addData(Ev(1, ts(0), 5, "click", 0.0), Ev(2, ts(40), 5, "click", 0.0))
      q.processAllAvailable()
      // ... until an out-of-order (but within-watermark) 10:20 bridges them
      source.addData(Ev(3, ts(20), 5, "click", 0.0))
      q.processAllAvailable()
      source.addData(Ev(99, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      source.addData(Ev(100, java.sql.Timestamp.valueOf("2024-01-04 00:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bridge_out").filter(col("user_id") === 5)
      .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSeq === Seq((ts(0), ts(40), 3L)))
  }

  test("native session_window face agrees with the batch and fMGWS sessionizers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = Streams.sessionizeNative(source.toDF(), gapSeconds = 1800,
      withWatermark = true, watermark = "10 minutes")
    val q = sessions.writeStream
      .format("memory").queryName("native_sessions_out").outputMode("append").start()
    try {
      source.addData(events: _*)
      q.processAllAvailable()
      source.addData(Ev(99, java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      source.addData(Ev(100, java.sql.Timestamp.valueOf("2024-01-03 12:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("native_sessions_out")
      .filter(col("user_id") < 9)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    val batch = Streams.sessionize(events.toDF(), gapSeconds = 1800)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
    assert(got.toSeq === batch.toSeq)
  }

  test("sessionize splits on the idle gap") {
    import spark.implicits._
    val sessions = Streams.sessionize(events.toDF(), gapSeconds = 1800)
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    // user 1: events at 10:00/10:05 then 10:59 (54min gap) → 2 sessions
    // user 2: 10:20 then 11:10 (50min gap) → 2 sessions
    assert(sessions.toSeq === Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("streaming dedup keeps one event per key within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val deduped = Streams.dedupStream(source.toDF(), Seq("user_id", "event_type"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      source.addData(events: _*) // user 1 clicks ×3, user 2 views ×2
      q.processAllAvailable()
      // an in-watermark duplicate arriving in a later batch is dropped too
      source.addData(Ev(50, ts(30), 1, "click", 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_out")
      .select("user_id", "event_type").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.toSeq === Seq((1L, "click"), (2L, "view")))
    // batch degradation: plain dropDuplicates
    val batch = Streams.dedupStream(events.toDF(), Seq("user_id", "event_type"),
      withWatermark = false)
    assert(batch.count() === 2L)
  }

  test("bloom dedup suppresses cross-batch duplicates with constant state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val deduped = Streams.bloomDedupStream(source.toDF(),
      concat_ws("|", col("user_id"), col("event_type")), buckets = 4,
      expectedPerBucket = 10000L, fpp = 0.001)
    val q = deduped.writeStream
      .format("memory").queryName("bloom_dedup_out").outputMode("append").start()
    try {
      source.addData(events: _*) // keys: (1,click)×3, (2,view)×2
      q.processAllAvailable()
      // duplicate in a LATER batch: the serialized filter must remember
      source.addData(Ev(60, ts(45), 1, "click", 9.0))
      // and a genuinely new key in a later batch must pass
      source.addData(Ev(61, ts(46), 3, "signup", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bloom_dedup_out")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // at fpp=0.001 over 3 tiny keys, false positives are impossible in
    // practice: output is exactly one row per distinct key
    assert(got.sorted.toSeq ===
      Seq((1L, "click"), (2L, "view"), (3L, "signup")))
    // batch degradation: one survivor per distinct key
    val batch = Streams.bloomDedupStream(events.toDF(),
      concat_ws("|", col("user_id"), col("event_type")), buckets = 4,
      expectedPerBucket = 10000L, fpp = 0.001)
    assert(batch.count() === 2L)
  }

  test("foreachBatch CDC compaction over a stream equals the one-shot batch merge") {
    import spark.implicits._
    import graft.store.CdcMerge
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("user_id", "balance")
    def toChanges(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("value").as("balance"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))
    val evs = Seq(
      Ev(1, ts(0), 1, "click", 11.0),
      Ev(2, ts(5), 2, "error", 0.0), // delete user 2
      Ev(3, ts(10), 1, "click", 12.0), // later update of user 1
      Ev(4, ts(15), 4, "click", 40.0)) // insert of a key absent from base
    val source = MemoryStream[Ev]
    var state = CdcMerge.initState(base, toChanges(evs.toDF()),
      "user_id", Seq("ts", "event_id"), "op")
    val q = source.toDF().writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        state = CdcMerge.compact(state, toChanges(b),
          "user_id", Seq("ts", "event_id"), "op").localCheckpoint()
    }.outputMode("append").start()
    try {
      // two micro-batches with the later update split from the delete
      source.addData(evs.take(2): _*); q.processAllAvailable()
      source.addData(evs.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = CdcMerge.visible(state, Seq("ts", "event_id"), "op")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oneShot = CdcMerge.merge(base, toChanges(evs.toDF()),
        "user_id", Seq("ts", "event_id"), "op")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === oneShot)
    assert(streamed === Map(1L -> 12.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("streaming CEP classifies purchases: chains, absence guard, windows, multi-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // window 600 s (10 min); ts(m) = minute m
    val evs = Seq(
      // user 1: clean chain → matched
      Ev(10, ts(0), 1, "view", 0.0), Ev(11, ts(2), 1, "click", 0.0),
      Ev(12, ts(4), 1, "purchase", 0.0),
      // user 2: error BETWEEN view and purchase → unmatched
      Ev(20, ts(0), 2, "view", 0.0), Ev(21, ts(1), 2, "error", 0.0),
      Ev(22, ts(2), 2, "click", 0.0), Ev(23, ts(4), 2, "purchase", 0.0),
      // user 3: error BEFORE the view → matched
      Ev(30, ts(0), 3, "error", 0.0), Ev(31, ts(1), 3, "view", 0.0),
      Ev(32, ts(2), 3, "click", 0.0), Ev(33, ts(4), 3, "purchase", 0.0),
      // user 4: view→click gap exceeds the window → unmatched
      Ev(40, ts(0), 4, "view", 0.0), Ev(41, ts(25), 4, "click", 0.0),
      Ev(42, ts(27), 4, "purchase", 0.0),
      // user 5: click→purchase gap exceeds the window → unmatched
      Ev(50, ts(0), 5, "view", 0.0), Ev(51, ts(2), 5, "click", 0.0),
      Ev(52, ts(20), 5, "purchase", 0.0),
      // user 6: an error splits two views; the LATER view rescues the
      // chain (max-view selection) → matched
      Ev(60, ts(0), 6, "view", 0.0), Ev(61, ts(1), 6, "error", 0.0),
      Ev(62, ts(3), 6, "view", 0.0), Ev(63, ts(5), 6, "click", 0.0),
      Ev(64, ts(7), 6, "purchase", 0.0),
      // user 7: bare purchase → emitted, unmatched
      Ev(70, ts(0), 7, "purchase", 0.0))
    val source = MemoryStream[Ev]
    val q = Streams.cepStream(source.toDF(), Seq("view", "click", "purchase"),
        guard = "error", windowSec = 600L).toDF()
      .writeStream.format("memory").queryName("cep_out")
      .outputMode("append").start()
    try {
      // split micro-batches at minute 3 — state (views, errors, clicks)
      // must carry across the boundary for every user
      source.addData(evs.filter(_.ts.before(ts(3))): _*)
      q.processAllAvailable()
      source.addData(evs.filterNot(_.ts.before(ts(3))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cep_out")
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(got === Map(12L -> true, 23L -> false, 33L -> true,
      42L -> false, 52L -> false, 64L -> true, 70L -> false))
  }

  test("4-step CEP chain with guard equals brute force on random streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "signup", "purchase")
    val rnd = new scala.util.Random(13)
    val types = steps :+ "error"
    val wSec = 600L
    val evs = (1 to 500).map { i =>
      Ev(i.toLong, ts(rnd.nextInt(60)), rnd.nextInt(6).toLong + 1,
        types(rnd.nextInt(types.length)), 0.0)
    }
    def us(e: Ev): Long = e.ts.getTime * 1000
    def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    // brute force: enumerate all chains (v < c < g < p, consecutive gaps
    // within the window, no error strictly between v and p)
    val want = evs.filter(_.event_type == "purchase").map { pEv =>
      val pk = (us(pEv), pEv.event_id)
      val user = evs.filter(_.user_id == pEv.user_id)
      def oft(t: String) = user.filter(_.event_type == t)
      val m = oft("signup").exists { g =>
        val gk = (us(g), g.event_id)
        lt(gk, pk) && us(pEv) - us(g) <= wSec * 1000000L &&
        oft("click").exists { c =>
          val ck = (us(c), c.event_id)
          lt(ck, gk) && us(g) - us(c) <= wSec * 1000000L &&
          oft("view").exists { v =>
            val vk = (us(v), v.event_id)
            lt(vk, ck) && us(c) - us(v) <= wSec * 1000000L &&
            !oft("error").exists { x =>
              val xk = (us(x), x.event_id)
              lt(vk, xk) && lt(xk, pk)
            }
          }
        }
      }
      pEv.event_id -> m
    }.toMap
    val source = MemoryStream[Ev]
    val q = Streams.cepStream(source.toDF(), steps, guard = "error",
        windowSec = wSec).toDF()
      .writeStream.format("memory").queryName("cep4_out")
      .outputMode("append").start()
    try {
      // three batches split at time boundaries
      source.addData(evs.filter(_.ts.before(ts(20))): _*)
      q.processAllAvailable()
      source.addData(evs.filter(e => !e.ts.before(ts(20)) && e.ts.before(ts(40))): _*)
      q.processAllAvailable()
      source.addData(evs.filterNot(_.ts.before(ts(40))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cep4_out")
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(got === want)
  }

  test("streaming CEP equals the brute-force EXISTS evaluation on random streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "error", "signup")
    val wSec = 600L
    val evs = (1 to 400).map { i =>
      Ev(i.toLong, ts(rnd.nextInt(60)), rnd.nextInt(8).toLong + 1,
        types(rnd.nextInt(types.length)), 0.0)
    }
    // driver brute force over the (µs, id) total order
    def us(e: Ev): Long = e.ts.getTime * 1000
    def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    val want = evs.filter(_.event_type == "purchase").map { p =>
      val pk = (us(p), p.event_id)
      val m = evs.exists { c =>
        c.event_type == "click" && c.user_id == p.user_id &&
        lt((us(c), c.event_id), pk) && us(p) - us(c) <= wSec * 1000000L &&
        evs.exists { v =>
          v.event_type == "view" && v.user_id == p.user_id &&
          lt((us(v), v.event_id), (us(c), c.event_id)) &&
          us(c) - us(v) <= wSec * 1000000L &&
          !evs.exists { x =>
            x.event_type == "error" && x.user_id == p.user_id &&
            lt((us(v), v.event_id), (us(x), x.event_id)) &&
            lt((us(x), x.event_id), pk)
          }
        }
      }
      p.event_id -> m
    }.toMap
    val source = MemoryStream[Ev]
    val q = Streams.cepStream(source.toDF(), Seq("view", "click", "purchase"),
        guard = "error", windowSec = wSec).toDF()
      .writeStream.format("memory").queryName("cep_rand_out")
      .outputMode("append").start()
    try { source.addData(evs: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.table("cep_rand_out")
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(got === want)
  }
}
