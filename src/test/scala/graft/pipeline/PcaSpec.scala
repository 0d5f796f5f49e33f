package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  // points strung along the direction (3,4)/5 in 3-d with a small
  // orthogonal wobble: the principal component is unambiguous
  private def planted = {
    import spark.implicits._
    val u = Array(0.6, 0.8, 0.0)
    val w = Array(-0.8, 0.6, 0.0) // unit, ⟂ u
    val pts = (-10 to 10).map { t =>
      val eps = (t % 3) * 0.05
      (t.toLong + 11L,
        Array.tabulate(3)(i => (t * u(i) + eps * w(i) + 0.5).toFloat))
    }
    pts.toDF("vec_id", "embedding")
  }

  test("moments match the direct computation") {
    val (n, mean, cov) = Pca.moments(planted, "embedding")
    assert(n === 21L)
    val rows = planted.collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val d = 3
    val m = Array.tabulate(d)(i => rows.map(_(i)).sum / rows.length)
    mean.zip(m).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    for (i <- 0 until d; j <- 0 until d) {
      val c = rows.map(r => (r(i) - m(i)) * (r(j) - m(j))).sum / rows.length
      assert(math.abs(cov(i)(j) - c) < 1e-9, s"cov($i,$j)")
    }
  }

  test("power iteration recovers the planted component") {
    val (_, _, cov) = Pca.moments(planted, "embedding")
    val (v, lambda) = Pca.firstComponent(cov)
    val cosU = math.abs(0.6 * v(0) + 0.8 * v(1))
    assert(cosU > 0.999, s"|cos(v,u)| = $cosU")
    // eigenpair residual: ||Cv - λv|| small relative to λ
    val cv = Array.tabulate(3)(i => cov(i).zip(v).map { case (a, b) => a * b }.sum)
    val resid = math.sqrt(cv.zip(v).map { case (a, b) => val r = a - lambda * b; r * r }.sum)
    assert(resid / lambda < 1e-9, s"residual $resid vs λ $lambda")
  }

  test("projection equals dot(x - mean, v) and is layout-pure") {
    val (_, mean, cov) = Pca.moments(planted, "embedding")
    val (v, _) = Pca.firstComponent(cov)
    val got = Pca.projectFirst(planted, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    planted.collect().foreach { r =>
      val x = r.getSeq[Float](1).map(_.toDouble)
      val want = x.zip(mean).zip(v).map { case ((xi, mi), vi) => (xi - mi) * vi }.sum
      assert(math.abs(got(r.getLong(0)) - want) < 1e-6)
    }
    // variance along v must dominate every coordinate axis (it is the
    // maximizer over ALL directions; the axes are a cheap witness set)
    val scores = got.values.toArray
    val sMean = scores.sum / scores.length
    val varV = scores.map(s => (s - sMean) * (s - sMean)).sum / scores.length
    (0 until 3).foreach(i => assert(varV >= cov(i)(i) - 1e-9))
    val again = Pca.projectFirst(planted.repartition(7), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, s) => assert(math.abs(again(k) - s) < 1e-9) }
  }

  test("power iteration stops at convergence, not the iteration cap") {
    val (_, _, cov) = Pca.moments(planted, "embedding")
    // a converged run and a generously-capped run agree: the tol check
    // is doing the stopping, so the cap is a backstop, not the answer
    val (v1, l1) = Pca.firstComponent(cov, maxIters = 1000)
    val (v2, l2) = Pca.firstComponent(cov, maxIters = 100000)
    assert(math.abs(l1 - l2) < 1e-9)
    v1.zip(v2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // exit residual is a true eigenpair residual, not a mid-flight state
    val cv = Array.tabulate(3)(i => cov(i).zip(v1).map { case (a, b) => a * b }.sum)
    val resid = math.sqrt(cv.zip(v1).map { case (a, b) =>
      val r = a - l1 * b; r * r }.sum)
    assert(resid / l1 < 1e-9)
  }

  test("rank-0 covariance (all-identical vectors) is a defined result") {
    import spark.implicits._
    val same = (1L to 5L).map(i => (i, Array(2.5f, -1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val (_, _, cov) = Pca.moments(same, "embedding")
    val (v, lambda) = Pca.firstComponent(cov)
    assert(lambda === 0.0)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    // projection of a constant corpus is the constant 0 for every row
    Pca.projectFirst(same, "vec_id", "embedding").collect()
      .foreach(r => assert(math.abs(r.getDouble(1)) < 1e-9))
  }
}
