package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {

  test("exact regime: capacity >= domain reproduces GROUP BY counts, layout-pure") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val items = (1 to 2000).map(_ => s"w${rnd.nextInt(20)}")
    val df = items.toDF("w").repartition(11)
    val got = FreqSketch.heavyHitters(df, "w", capacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === expected)
    val again = FreqSketch.heavyHitters(df.repartition(3), "w", capacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === expected)
  }

  test("eviction regime: MG bound holds and true heavy hitters survive") {
    import spark.implicits._
    // skewed stream: "hot" 500×, "warm" 200× (both above the
    // N/(capacity+1) = 1100/9 ≈ 122 survival guarantee), plus 400
    // distinct singletons; capacity 8 forces constant eviction
    val rnd = new scala.util.Random(13)
    val items = rnd.shuffle(
      Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
        (1 to 400).map(i => s"noise$i"))
    val n = items.size
    val capacity = 8
    val got = FreqSketch.heavyHitters(items.toDF("w").repartition(5), "w", capacity)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // reported counts are lower bounds within N/(capacity+1) of truth
    got.foreach { case (k, est) =>
      assert(est <= truth(k))
      assert(truth(k) - est <= n.toLong / (capacity + 1))
    }
    // anything with true count above the bound is guaranteed present
    val mustSurvive = truth.filter(_._2 > n.toLong / (capacity + 1)).keySet
    assert(mustSurvive.subsetOf(got.keySet))
    assert(mustSurvive === Set("hot", "warm"))
  }

  test("sketch aggregates a stream in complete mode like the batch plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val items = (1 to 300).map(i => s"w${i % 7}")
    source.addData(items: _*)
    val q = FreqSketch.heavyHitters(source.toDF().toDF("w"), "w", capacity = 16)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hh_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = FreqSketch.heavyHitters(items.toDF("w"), "w", capacity = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    assert(streamed.values.sum === 300L)
  }

  test("windowed sketch emits finalized windows in append mode past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val f = udaf(new FreqSketch.MisraGriesAggregator(capacity = 8),
      org.apache.spark.sql.Encoders.STRING)
    val agg = source.toDF().toDF("ts", "w")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(f(col("w")).as("hh"))
      .select(col("win.start").as("ws"), explode(col("hh")).as("e"))
      .select(col("ws"), col("e._1").as("item"), col("e._2").as("est_count"))
    val q = agg.writeStream.format("memory").queryName("hh_win_out")
      .outputMode("append").start()
    try {
      source.addData(Seq(t(0) -> "a", t(5) -> "a", t(10) -> "b", t(20) -> "a"): _*)
      q.processAllAvailable()
      // advance the watermark past the 10:00 window so it finalizes
      source.addData(java.sql.Timestamp.valueOf("2024-01-01 12:00:00") -> "z")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hh_win_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((t(0), "a", 3L), (t(0), "b", 1L)))
  }

  test("heavy hitters plan partial-merges the sketch before the exchange") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"w${i % 5}").toDF("w")
    val plan = FreqSketch.heavyHitters(df, "w", capacity = 16)
      .queryExecution.executedPlan.toString
    val partialIdx = plan.toLowerCase.indexOf("partial_misragriesaggregator")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(partialIdx >= 0, s"no partial sketch aggregate in plan:\n$plan")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial sketch not below the exchange:\n$plan")
  }
}
