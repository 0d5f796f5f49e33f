package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class ProfilerSpec extends SparkSpec {

  test("per-column stats are exact on a mixed-type table with nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("abc")),
      (2L, Some(-1.25), Some("de")),
      (3L, None, Some("abc")),
      (4L, Some(2.5), None),
      (5L, None, Some("fghij"))).toDF("id", "x", "s").repartition(3)
    val prof = Profiler.summarize(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet === Set("id", "x", "s"))
    prof.values.foreach(r => assert(r.getLong(2) === 5L)) // n_rows
    val id = prof("id")
    assert(id.getString(1) === "bigint" && id.getLong(3) === 0L &&
      id.getLong(4) === 5L && id.getDouble(5) === 1.0 &&
      id.getDouble(6) === 5.0 && id.isNullAt(7))
    val x = prof("x")
    assert(x.getString(1) === "double" && x.getLong(3) === 2L &&
      x.getLong(4) === 2L && x.getDouble(5) === -1.25 &&
      x.getDouble(6) === 2.5)
    val s = prof("s")
    assert(s.getString(1) === "string" && s.getLong(3) === 1L &&
      s.getLong(4) === 3L && s.isNullAt(5) && s.isNullAt(6) &&
      s.getDouble(7) === 3.25) // (3 + 2 + 3 + 5) / 4
  }

  test("approx face keeps the schema and lands within HLL tolerance") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, s"v${i % 500}")).toDF("id", "v")
    val exact = Profiler.summarize(df).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val approx = Profiler.summarize(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(exact("id") === 2000L && exact("v") === 500L)
    approx.foreach { case (c, nd) =>
      assert(math.abs(nd - exact(c)).toDouble / exact(c) < 0.1, s"$c: $nd")
    }
  }

  test("exact profile plans ONE scan of the input") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"s$i")).toDF("a", "b")
    val plan = Profiler.summarize(df).queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("LocalTableScan".r.findAllIn(plan).size <= 1, plan)
  }
}
