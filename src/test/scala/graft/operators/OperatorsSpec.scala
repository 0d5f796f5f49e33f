package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed dataset") {
    import spark.implicits._
    // hot key 1L carries 500 rows, the rest are singletons
    val skewed = (Seq.fill(500)(1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val dim = (1L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "name").collect().toSet
    val salted = SkewJoin.salted(skewed, dim, Seq("k"), saltFactor = 8)
      .select("k", "payload", "name").collect().toSet
    assert(salted === plain)
    assert(plain.size === 549)
  }

  test("asof backward carries the latest preceding payload per key") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 10:30:00"), 200L)).toDF("k", "ts", "probe_id")
    val refs = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),
      (2L, ts("2024-01-01 10:30:00"), 9.0), // equal ts → visible (inclusive)
      (3L, ts("2024-01-01 00:00:00"), 7.0)).toDF("k", "ts", "v")
    val got = AsOf.backward(probes, refs, "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(got === Map(100L -> Some(1.0), 101L -> Some(2.0), 200L -> Some(9.0)))
  }

  test("asof forward carries the earliest following payload per key, inclusive") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 10:30:00"), 200L),
      (3L, ts("2024-01-01 10:00:00"), 300L)).toDF("k", "ts", "probe_id")
    val refs = Seq(
      (1L, ts("2024-01-01 10:15:00"), 1.0),
      (1L, ts("2024-01-01 12:00:00"), 2.0),
      (2L, ts("2024-01-01 10:30:00"), 9.0), // equal ts → visible (inclusive)
      (3L, ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "ts", "v") // only BEFORE
    val got = AsOf.forward(probes, refs, "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(got === Map(100L -> Some(1.0), 101L -> Some(2.0),
      200L -> Some(9.0), 300L -> None))
  }

  test("asof nearest picks the closer side within tolerance, backward on ties") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // back 9:58 (2m) vs fwd 10:05 (5m)
      (2L, ts("2024-01-01 10:00:00"), 200L), // equidistant ±3m → backward wins
      (3L, ts("2024-01-01 10:00:00"), 300L), // only match outside tolerance
      (4L, ts("2024-01-01 10:00:00"), 400L)  // forward only, inside
    ).toDF("k", "ts", "probe_id")
    val refs = Seq(
      (1L, ts("2024-01-01 09:58:00"), 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2.0),
      (2L, ts("2024-01-01 09:57:00"), 3.0),
      (2L, ts("2024-01-01 10:03:00"), 4.0),
      (3L, ts("2024-01-01 10:20:00"), 5.0),
      (4L, ts("2024-01-01 10:08:00"), 6.0)).toDF("k", "ts", "v")
    val got = AsOf.nearest(probes, refs, "k", "ts", Seq("v"),
        toleranceSeconds = 600.0)
      .collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(got === Map(100L -> Some(1.0), 200L -> Some(3.0),
      300L -> None, 400L -> Some(6.0)))
  }

  test("asof never matches null reference keys (SQL equality semantics)") {
    val probes = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(null, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        org.apache.spark.sql.Row(java.lang.Long.valueOf(5L),
          java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType, true),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType, true),
        org.apache.spark.sql.types.StructField("probe_id", org.apache.spark.sql.types.LongType, false))))
    val refs = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(null, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"),
          java.lang.Double.valueOf(7.0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType, true),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType, true),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType, true))))
    val got = AsOf.backward(probes, refs, "k", "ts", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    // the null-key reference row matches neither probe
    assert(got === Map(1L -> None, 2L -> None))
  }

  test("asof carries the matched row atomically: NULL fields stay NULL") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // most recent reference row has v=NULL, w=20: DuckDB ASOF JOIN
    // attaches THAT row — v must come back NULL, not the older 1.0,
    // and w must come from the same row (no cross-row mixing)
    val probes = Seq((1L, ts("2024-01-01 12:00:00"), 100L)).toDF("k", "ts", "probe_id")
    val refs = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option(1.0), Option(10L)),
      (1L, ts("2024-01-01 10:00:00"), Option.empty[Double], Option(20L)))
      .toDF("k", "ts", "v", "w")
    val r = AsOf.backward(probes, refs, "k", "ts", Seq("v", "w")).collect()(0)
    assert(Option(r.get(3)) === None)       // asof_v: NULL of the matched row
    assert(r.getLong(4) === 20L)            // asof_w: same (latest) row
  }

  test("range join fails fast on an interval spanning too many buckets") {
    import spark.implicits._
    val points = Seq((5L, "p")).toDF("ts", "pid")
    val sentinel = Seq((0L, 253402300800L, "open-ended")).toDF("s", "e", "iid")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "ts", sentinel, "s", "e",
        bucketWidthSeconds = 1L, maxBucketsPerInterval = 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("buckets")))
  }

  test("funnel counts users per ordered step, strictly after the previous step") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // u2 views then purchases without clicking → stops at step 1
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:01:00")),
      // u3's early click precedes the view and must NOT count; the
      // later one does → reaches step 2, never purchases
      (3L, "click", ts("2024-01-01 09:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-01 10:30:00")),
      // u4 purchases before viewing → step 1 only
      (4L, "purchase", ts("2024-01-01 09:00:00")),
      (4L, "view", ts("2024-01-01 10:00:00")),
      // u5 clicks at the SAME instant as the view — strictly-after
      // excludes it
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "click", ts("2024-01-01 10:00:00"))).toDF("user_id", "event_type", "ts")
    val counts = Funnel.counts(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts === Map(1L -> 5L, 2L -> 2L, 3L -> 1L))
  }

  test("funnel latencies interpolate percentiles over the earliest step gaps") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")), // +300s
      (1L, "purchase", ts("2024-01-01 10:10:00")), // +300s
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-01 10:30:00")) // +1800s
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.latencies(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // view->click gaps {300, 1800}: p50 midpoint 1050, p90 = 300+0.9·1500
    assert(got("view->click") === ((2L, 1050.0, 1650.0, 1800.0)))
    assert(got("click->purchase") === ((1L, 300.0, 300.0, 300.0)))
  }

  test("bucketized range join equals the predicate join across bucket boundaries") {
    import spark.implicits._
    val points = (0L to 100L by 3L).map(t => (t, s"p$t")).toDF("ts", "pid")
    val intervals = Seq((5L, 20L, "a"), (19L, 22L, "b"), (90L, 200L, "c"), (40L, 41L, "d"))
      .toDF("s", "e", "iid")
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "s", "e",
        bucketWidthSeconds = 7L)
      .select("pid", "iid").collect().toSet
    val expected = points.join(intervals,
        col("ts") >= col("s") && col("ts") <= col("e"))
      .select("pid", "iid").collect().toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("topk aggregator equals the window formulation, ties broken by id") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate values force the (value desc, id asc) tiebreak; many
    // partitions force real partial-buffer merges
    val rows = (1L to 400L).map(i => (i % 7, rnd.nextInt(20).toDouble, i))
    val df = rows.toDF("g", "v", "id").repartition(13)
    val got = TopK.topKPerGroup(df, "g", "v", "id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank").cast("long"), col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
    assert(got.size === 35) // 7 groups x 5
  }

  test("topk aggregator ranks NaN above every double, like the window's desc sort") {
    import spark.implicits._
    val df = Seq((0L, 1.0, 1L), (0L, Double.NaN, 2L), (0L, 5.0, 3L),
      (0L, Double.NaN, 4L), (0L, -0.0, 5L), (0L, 0.0, 6L)).toDF("g", "v", "id")
    val got = TopK.topKPerGroup(df, "g", "v", "id", k = 4)
      .select("rank", "id").collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select(col("rank").cast("long"), col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got === expected)
    // NaNs first (ids 2,4 by the id tiebreak), then 5.0, then 1.0
    assert(got === Set(1L -> 2L, 2L -> 4L, 3L -> 3L, 4L -> 1L))
  }

  test("q_topk_agg plans the partial topkaggregator before the exchange") {
    // the whole point of the aggregate formulation is map-side partials:
    // ≤ k entries per (group, map partition) cross the wire. Assert the
    // physical plan keeps that shape so a Spark upgrade can't silently
    // de-optimize it into a full shuffle + sort.
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 5, i.toDouble, i)).toDF("g", "v", "id")
    val plan = TopK.topKPerGroup(df, "g", "v", "id", k = 3)
      .queryExecution.executedPlan.toString
    val partialIdx = plan.toLowerCase.indexOf("partial_topkaggregator")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(partialIdx >= 0, s"no partial topkaggregator in plan:\n$plan")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      // plan trees print top-down: the partial agg is BELOW (after, in
      // text) the exchange iff it runs before it
      s"partial aggregate not below the exchange:\n$plan")
  }

  test("fuzzy-match block cap bounds a planted hot block and the audit sees it") {
    import spark.implicits._
    // hot block: 40 same-length names sharing the last word "corp" →
    // 780 uncapped candidate pairs from one key; plus one small clean
    // block ("ab x"/"ac x") whose pair must survive the cap
    val hot = (1L to 40L).map(i => (i, f"v$i%02d corp"))
    val clean = Seq((100L, "ab x"), (101L, "ac x"))
    val df = (hot ++ clean).toDF("id", "name")
    val uncapped = FuzzyMatch.matchPairs(df, "id", "name", maxDist = 2)
    assert(uncapped.count() === 780L + 1L)
    val capped = FuzzyMatch.matchPairs(df, "id", "name", maxDist = 2,
      maxBlockSize = 10L)
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // the hot block contributes nothing; the clean pair survives
    assert(got.toSeq === Seq((100L, 101L)))
    // audit face: exactly the dropped block, with its population
    val audit = FuzzyMatch.oversizedBlocks(df, "id", "name", maxBlockSize = 10L)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(audit.toSeq === Seq(("corp", 40L)))
    // no cap → no audit rows
    assert(FuzzyMatch.oversizedBlocks(df, "id", "name",
      maxBlockSize = Long.MaxValue).isEmpty)
  }
}
