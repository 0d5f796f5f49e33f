package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native codegen expressions must agree with Spark's own
  * higher-order-function formulation (the code they replaced) on random
  * data and edge cases, in BOTH execution modes — whole-stage codegen
  * and interpreted (nullSafeEval).
  */
class VectorExpressionsSpec extends SparkSpec {

  private def referenceDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private lazy val df = {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian()), Array.fill(16)(rnd.nextGaussian())))
    spark.createDataFrame(rows).toDF("id", "a", "b")
  }

  test("dot/cosine/l2sq match the higher-order-function reference") {
    val got = df.select(
        VectorFunctions.dot(col("a"), col("b")).as("dot"),
        VectorFunctions.cosine(col("a"), col("b")).as("cos"),
        VectorFunctions.l2sq(col("a"), col("b")).as("l2"),
        referenceDot(col("a"), col("b")).as("rdot"),
        (referenceDot(col("a"), col("b")) /
          (sqrt(referenceDot(col("a"), col("a"))) *
            sqrt(referenceDot(col("b"), col("b"))))).as("rcos"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("rl2"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(3)) < 1e-9)
      assert(math.abs(r.getDouble(1) - r.getDouble(4)) < 1e-9)
      assert(math.abs(r.getDouble(2) - r.getDouble(5)) < 1e-9)
    }
  }

  test("interpreted mode agrees with codegen") {
    val conf = spark.conf
    val prev = conf.get("spark.sql.codegen.wholeStage", "true")
    val codegen = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
      codegen.zip(interp).foreach { case (c, i) => assert(math.abs(c - i) < 1e-12) }
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prev)
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("l2sqAt ≡ l2sq over slice — every offset, short arrays, both execution modes") {
    val rnd = new scala.util.Random(11)
    // mixed lengths so the short-array clamping paths are exercised
    val rows = Seq.tabulate(40)(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian()),
        Array.fill(if (i % 5 == 0) 3 else 4)(rnd.nextGaussian())))
    val d = spark.createDataFrame(rows).toDF("id", "full", "sub")
    def check(): Unit =
      for (off <- Seq(0, 4, 8, 12, 14, 20)) {
        val got = d.select(col("id"),
            VectorFunctions.l2sqAt(col("full"), col("sub"), off).as("at"),
            VectorFunctions.l2sq(slice(col("full"), off + 1, 4), col("sub")).as("ref"))
          .collect()
        got.foreach { r =>
          assert(!r.isNullAt(1) && !r.isNullAt(2), s"off=$off id=${r.getLong(0)}")
          assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
            s"off=$off id=${r.getLong(0)}")
        }
      }
    check() // codegen
    val conf = spark.conf
    val prev = conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      check() // interpreted
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prev)
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // null elements inside the window null the result; outside don't
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("full",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, true)),
      org.apache.spark.sql.types.StructField("sub",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, true))))
    val nd = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(Seq[Any](1.0, null, 3.0, 4.0), Seq[Any](1.0, 1.0)),
        org.apache.spark.sql.Row(Seq[Any](1.0, null, 3.0, 4.0), Seq[Any](1.0, 1.0))),
      schema)
    val r0 = nd.select(VectorFunctions.l2sqAt(col("full"), col("sub"), 0)).collect()
    assert(r0.forall(_.isNullAt(0)), "null inside window must null the result")
    val r2 = nd.select(VectorFunctions.l2sqAt(col("full"), col("sub"), 2)).collect()
    assert(r2.forall(r => !r.isNullAt(0)), "null outside window must not null")
  }

  test("null ELEMENTS null the result, matching the HOF formulation") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, true)),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, true))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      org.apache.spark.sql.Row(Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))
    val df2 = spark.createDataFrame(rows, schema)
    val got = df2.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.cosine(col("a"), col("b")).as("c"),
      referenceDot(col("a"), col("b")).as("rd")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).getDouble(0) === 11.0 && got(1).getDouble(2) === 11.0)
  }

  test("edge cases: empty arrays, zero vectors, nulls") {
    import spark.implicits._
    val edge = Seq(
      (1L, Some(Array.empty[Double]), Some(Array.empty[Double])),
      (2L, Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0))),
      (3L, None, Some(Array(1.0))),
      (4L, Some(Array(1.0, 2.0, 3.0)), Some(Array(1.0, 2.0, 3.0))))
      .toDF("id", "a", "b")
    val rows = edge.select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("dot"),
        VectorFunctions.cosine(col("a"), col("b")).as("cos"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 0.0)          // empty → dot 0
    assert(rows(1).getDouble(1) === 0.0)          // zero vector → dot 0
    assert(rows(1).getDouble(2).isNaN)            // zero norm → NaN like DuckDB
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2)) // null in → null out
    assert(math.abs(rows(3).getDouble(2) - 1.0) < 1e-12) // self cosine = 1
  }
}
