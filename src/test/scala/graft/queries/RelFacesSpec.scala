package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Brute-force cross-checks of relational faces whose scale-correct
  * formulation is subtle enough that the oracle alone (which mirrors
  * the same reduction) wouldn't catch a shared blind spot.
  */
class RelFacesSpec extends SparkSpec {

  test("q_skyline equals quadratic dominance on the real part table") {
    val got = Relational.qSkyline(spark, sf())
      .collect().map(_.getLong(0)).toSet
    // brute force: p survives iff no q with both dims <= and one strict
    val parts = Tables.load(spark, sf(), "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("c"),
        col("p_size").cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = parts.filter { case (pk, c, s) =>
      !parts.exists { case (qk, qc, qs) =>
        qk != pk && qc <= c && qs <= s && (qc < c || qs < s)
      }
    }.map(_._1).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("q_attribution equals a driver last-touch replay on the real events") {
    val got = Relational.qAttribution(spark, sf())
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val evs = Tables.load(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3), r.getLong(4)))
    val byUser = evs.groupBy(_._1)
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    byUser.values.foreach { rows =>
      // full µs precision: getTime truncates to ms and could mis-order
      val sorted = rows.sortBy(e =>
        (e._3.getTime * 1000 + e._3.getNanos / 1000 % 1000, e._4))
      var touch: String = null
      sorted.foreach { case (_, et, _, _, cents) =>
        if (et == "purchase") {
          val k = if (touch == null) "none" else touch
          val (n, t) = acc.getOrElse(k, (0L, 0L))
          acc(k) = (n + 1, t + cents)
        }
        if (et == "click" || et == "view") touch = et
      }
    }
    val expected = acc.view.mapValues { case (n, t) =>
      (n, math.round(t / 100.0 * 100.0) / 100.0)
    }.toMap
    assert(got === expected)
  }

  test("q_streaks equals driver island detection on the real events") {
    val got = Relational.qStreaks(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val days = Tables.load(spark, sf(), "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
    val expected = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2.toEpochDay).distinct.sorted
      val runs = sorted.foldLeft(List.empty[List[Long]]) {
        case (h :: t, d) if d == h.head + 1 => (d :: h) :: t
        case (accum, d) => List(d) :: accum
      }
      (u, runs.map(_.size.toLong).max, sorted.size.toLong, runs.size.toLong)
    }.toSeq
      .sortBy { case (u, longest, nd, _) => (-longest, -nd, u) }
      .take(100).toSet
    assert(got === expected)
  }

  test("q_skyline keeps equal-attribute ties (dominance needs one strict)") {
    import spark.implicits._
    // planted: two identical frontier points (1, 2), one dominated (3)
    // by both, one frontier on the other axis (4)
    val p = Seq(
      (1L, 100L, 5L), (2L, 100L, 5L), (3L, 120L, 6L), (4L, 90L, 9L))
      .toDF("p_partkey", "cents", "p_size")
    val minsz = p.groupBy(col("cents")).agg(min(col("p_size")).as("msz"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cents"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val frontier = minsz.withColumn("m1", min(col("msz")).over(w))
      .filter(col("m1").isNull || col("m1") > col("msz"))
      .select(col("cents").as("fc"), col("msz"))
    val sky = p.join(frontier,
        col("cents") === col("fc") && col("p_size") === col("msz"))
      .collect().map(_.getLong(0)).toSet
    assert(sky === Set(1L, 2L, 4L))
  }
}
