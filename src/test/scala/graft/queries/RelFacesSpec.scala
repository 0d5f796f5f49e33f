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
