package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** First-principal-component analysis over an embedding column — the
  * corpus-geometry audit (dominant variance direction, projection
  * scores for slicing/stratifying a training set).
  *
  * Split: the corpus-sized work is ONE mapPartitions pass accumulating
  * per-partition (n, Σx, Σxxᵀ) into dim / dim² local arrays — only the
  * ≤ #partitions bounded partials leave the executors, the same
  * codebook-sized-driver-state contract as k-means
  * ([[Cluster.updateCentroids]]). The eigen solve is driver-side power
  * iteration on the dim×dim covariance (dim is model-bounded — 64 here,
  * ≤ a few thousand anywhere — never corpus-bounded), and the
  * projection is a broadcast dot-product expression, fully codegen.
  * At 100 TB nothing changes: the partial size is independent of row
  * count, and the one pass streams.
  */
object Pca {

  /** (count, mean, covariance) of `vecCol` (population covariance,
    * E[xxᵀ] − μμᵀ). Driver combine runs in partition order, so the
    * result is deterministic for a fixed partitioning.
    */
  def moments(emb: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val partials = emb.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
      .mapPartitions { it =>
        var n = 0L
        var s: Array[Double] = null
        var xx: Array[Double] = null
        while (it.hasNext) {
          val v = it.next()
          val d = v.length
          if (s == null) { s = new Array[Double](d); xx = new Array[Double](d * d) }
          require(v.length == s.length, s"ragged embedding: ${v.length} vs ${s.length}")
          var i = 0
          while (i < d) {
            val xi = v(i)
            s(i) += xi
            var j = i
            while (j < d) { xx(i * d + j) += xi * v(j); j += 1 } // upper triangle
            i += 1
          }
          n += 1L
        }
        if (n == 0L) Iterator.empty else Iterator.single((n, s, xx))
      }.collect()

    require(partials.nonEmpty, "moments over an empty embedding table")
    val d = partials.head._2.length
    var n = 0L
    val s = new Array[Double](d)
    val xx = new Array[Double](d * d)
    partials.foreach { case (pn, ps, pxx) =>
      n += pn
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { xx(i) += pxx(i); i += 1 }
    }
    val mean = s.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val ij = if (i <= j) xx(i * d + j) else xx(j * d + i)
      ij / n - mean(i) * mean(j)
    }
    (n, mean, cov)
  }

  /** Leading eigenpair of a symmetric PSD matrix by power iteration.
    * Deterministic: init is the basis vector of the largest-variance
    * coordinate, and the sign convention (largest-|coordinate| entry
    * positive) pins the eigenvector's inherent ± ambiguity.
    *
    * Runs to CONVERGENCE (||v_new − v_old|| < tol), capped at `maxIters`
    * — a fixed iteration count can return a non-converged direction when
    * the top two eigenvalues are near-equal, and the downstream
    * projection rounds that unconverged score into the gate. A rank-0
    * covariance (all-identical vectors: λ = 0, every direction is an
    * eigenvector) returns the deterministic init vector with λ = 0
    * rather than aborting — the projection is then the constant 0 for
    * every row, a defined and correct degenerate answer.
    */
  def firstComponent(cov: Array[Array[Double]], maxIters: Int = 1000,
      tol: Double = 1e-12): (Array[Double], Double) = {
    val d = cov.length
    var v = new Array[Double](d)
    v((0 until d).maxBy(i => cov(i)(i))) = 1.0
    var lambda = 0.0
    var it = 0
    var resid = Double.MaxValue
    while (it < maxIters && resid >= tol) {
      val w = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      if (nrm == 0.0) {
        // v lies in the null space: PSD + power step → λ = 0 along v;
        // keep the deterministic current direction, done
        lambda = 0.0
        resid = 0.0
      } else {
        val vn = w.map(_ / nrm)
        resid = math.sqrt(vn.zip(v).map { case (a, b) =>
          (a - b) * (a - b) }.sum)
        v = vn
        lambda = nrm
      }
      it += 1
    }
    val jm = (0 until d).maxBy(i => math.abs(v(i)))
    if (v(jm) < 0) v = v.map(x => -x)
    (v, lambda)
  }

  private def litVec(v: Array[Double]): Column =
    array(v.toIndexedSeq.map(lit): _*)

  /** Centered projection score onto the first principal component:
    * dot(x − μ, v) = dot(x, v) − dot(μ, v), so the per-row work is one
    * codegen dot product against the broadcast literal vector plus a
    * scalar shift — no per-row centering materialization.
    */
  def projectFirst(emb: DataFrame, idCol: String, vecCol: String,
      maxIters: Int = 1000): DataFrame = {
    val (_, mean, cov) = moments(emb, vecCol)
    val (v, _) = firstComponent(cov, maxIters)
    val shift = mean.zip(v).map { case (m, c) => m * c }.sum
    emb.select(col(idCol),
      (VectorFunctions.dot(col(vecCol).cast("array<double>"), litVec(v)) - lit(shift))
        .as("score"))
  }
}
